"""Kernel bottleneck decomposition on realistic masks (real chip).

Times ablated variants of the gather kernel to attribute the per-program
cost: dma-only (waits, no compute), compute-only (no DMAs), no-mask,
no-exp, and the production kernel.  Masks come from the actual plan on
smooth (model-statistics) inputs at the Hunyuan operating point.

Usage: python scripts/bench_kernelvars.py [--variants base,dma,compute,nomask,noexp]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def piece_lengths(indices, counts, chunk: int, max_run: int):
    """Per-slot DMA piece lengths for run-coalesced gathering.

    A piece starts where the compacted index list breaks contiguity, at
    chunk boundaries, and every ``max_run`` slots within a run; its length
    covers the contiguous slots it spans (0 on covered/invalid slots)."""
    import jax
    import jax.numpy as jnp
    nb = indices.shape[-1]
    s = jnp.arange(nb, dtype=jnp.int32)
    valid = s < counts[..., None]
    adj = jnp.concatenate(
        [jnp.zeros((*indices.shape[:-1], 1), bool),
         indices[..., 1:] == indices[..., :-1] + 1], axis=-1)
    adj = adj & ((s % chunk) != 0) & valid
    is_start = valid & ~adj
    ax = indices.ndim - 1
    run_start = jax.lax.cummax(jnp.where(is_start, s, -1), axis=ax)
    pos = s - run_start
    piece_start = valid & (pos % max_run == 0)
    starts_pos = jnp.where(is_start, s, 2 * nb)
    nxt = jax.lax.cummin(starts_pos[..., ::-1], axis=ax)[..., ::-1]
    nxt_after = jnp.concatenate(
        [nxt[..., 1:], jnp.full((*indices.shape[:-1], 1), 2 * nb,
                                jnp.int32)], axis=-1)
    run_end = jnp.minimum(nxt_after, counts[..., None])
    # chunk boundary also ends a piece
    chunk_end = (s // chunk + 1) * chunk
    run_end = jnp.minimum(run_end, chunk_end)
    return jnp.where(piece_start,
                     jnp.minimum(run_end - s, max_run), 0).astype(jnp.int32)


def build_variant_kernel(variant, block_n, chunk_blocks, sm_scale,
                         visual_len, text_start):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rectified_spaattn_tpu.kernels.block_sparse import MASK_VALUE

    nbuf = 3 if variant.endswith("3") else 2

    def kernel(counts_ref, tlen_ref, idx_ref, q_ref, kv_hbm, o_ref,
               kv_buf, sems):
        bh = pl.program_id(0)
        count = counts_ref[0, 0, 0, 0]
        tlen = tlen_ref[0, 0, 0]
        bm = q_ref.shape[1]
        d = q_ref.shape[2]
        g = chunk_blocks
        nb = idx_ref.shape[-1]
        num_chunks = (count + g - 1) // g

        half = variant == "dmahalf"
        big = variant == "dmabig"

        def block_dma(buf_slot, lane, block_idx):
            if half:     # half the rows -> half the bytes, same descriptor
                return pltpu.make_async_copy(
                    kv_hbm.at[bh, pl.ds(block_idx * block_n, block_n // 2)],
                    kv_buf.at[buf_slot, lane, pl.ds(0, block_n // 2)],
                    sems.at[buf_slot, lane])
            return pltpu.make_async_copy(
                kv_hbm.at[bh, pl.ds(block_idx * block_n, block_n)],
                kv_buf.at[buf_slot, lane],
                sems.at[buf_slot, lane])

        def chunk_dma(buf_slot, first_idx):
            # BW-ceiling probe: ONE contiguous g-block (1 MB) copy per
            # chunk anchored at the chunk's first index (results wrong;
            # the big variant allocates a flat [g*bn, 2D] buffer)
            return pltpu.make_async_copy(
                kv_hbm.at[bh, pl.ds(first_idx * block_n, g * block_n)],
                kv_buf.at[buf_slot],
                sems.at[buf_slot, 0])

        def start_chunk(buf_slot, chunk_idx):
            base = chunk_idx * g
            if big:
                pos = jnp.minimum(base, nb - 1)
                idx = jnp.minimum(idx_ref[0, 0, 0, pos],
                                  (kv_hbm.shape[1] // block_n) - g)
                chunk_dma(buf_slot, idx).start()
                return
            for lane in range(g):
                pos = jnp.minimum(base + lane, nb - 1)
                block_dma(buf_slot, lane, idx_ref[0, 0, 0, pos]).start()

        use_dma = not variant.startswith("compute")
        if use_dma:
            @pl.when(count > 0)
            def _():
                start_chunk(0, 0)
                if nbuf == 3:
                    @pl.when(num_chunks > 1)
                    def _():
                        start_chunk(1, 1)

        q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(kv_buf.dtype)
        init = (jnp.full((bm, 1), -jnp.inf, jnp.float32),
                jnp.zeros((bm, 1), jnp.float32),
                jnp.zeros((bm, d), jnp.float32))

        def body(c, carry):
            m_prev, l_prev, acc = carry
            buf_slot = jax.lax.rem(c, nbuf)
            base = c * g
            if use_dma:
                @pl.when(c + (nbuf - 1) < num_chunks)
                def _():
                    start_chunk(jax.lax.rem(c + nbuf - 1, nbuf),
                                c + nbuf - 1)
            if big:
                pos = jnp.minimum(base, nb - 1)
                idx = jnp.minimum(idx_ref[0, 0, 0, pos],
                                  (kv_hbm.shape[1] // block_n) - g)
                chunk_dma(buf_slot, idx).wait()
                acc = acc + kv_buf[buf_slot, :1, :d].astype(jnp.float32)
                return m_prev, l_prev, acc
            if variant == "computeclean":
                # clean-chunk body: no scalar reads, no cols, no masking —
                # isolates the MXU+softmax cost from the lane machinery
                kv = kv_buf[buf_slot]
                k = kv[:, :, :d].reshape(g * block_n, d)
                v = kv[:, :, d:].reshape(g * block_n, d)
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                m_cur = jnp.max(s, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - m_next)
                l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
                acc = acc * alpha + jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32)
                return m_next, l_next, acc
            lane_cols = []
            for lane in range(g):
                pos = jnp.minimum(base + lane, nb - 1)
                idx = idx_ref[0, 0, 0, pos]
                lane_cols.append(idx * block_n + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_n), 1))
                if use_dma:
                    block_dma(buf_slot, lane, idx).wait()
            if variant in ("dma", "dmahalf"):
                # consume one row of the data so copies are not dead-code
                acc = acc + kv_buf[buf_slot, 0, :1, :d].astype(jnp.float32)
                return m_prev, l_prev, acc
            cols = jnp.concatenate(lane_cols, axis=1)
            kv = kv_buf[buf_slot]
            k = kv[:, :, :d].reshape(g * block_n, d)
            v = kv[:, :, d:].reshape(g * block_n, d)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if variant not in ("nomask", "computenomask"):
                slot_ids = base + jax.lax.broadcasted_iota(
                    jnp.int32, (1, g * block_n), 1) // block_n
                valid = slot_ids < count
                valid &= cols < visual_len if text_start is None else (
                    (cols < visual_len) |
                    ((cols >= text_start) & (cols < text_start + tlen)))
                s = jnp.where(valid, s, MASK_VALUE)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            if variant in ("noexp", "computenoexp"):
                alpha = m_prev - m_next + 1.0
                p = s - m_next
            else:
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            return m_next, l_next, acc

        m, l, acc = jax.lax.fori_loop(0, num_chunks, body, init)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)

    return kernel


def build_twophase_kernel(block_n, chunk_blocks, sm_scale, visual_len,
                          text_start):
    """Two-phase chunk loop: ascending compacted indices put every
    window-sensitive block (padded boundary visual block, text blocks) at
    the END of the row's list, so chunks made entirely of clean slots need
    NO masking, NO column coordinates, NO per-lane scalar reads — only the
    1-2 tail chunks run the fully masked path."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rectified_spaattn_tpu.kernels.block_sparse import MASK_VALUE

    def kernel(counts_ref, clean_ref, tlen_ref, idx_ref, q_ref, kv_hbm,
               o_ref, kv_buf, sems):
        bh = pl.program_id(0)
        count = counts_ref[0, 0, 0, 0]
        clean = clean_ref[0, 0, 0, 0]      # slots < clean are mask-free
        tlen = tlen_ref[0, 0, 0]
        bm = q_ref.shape[1]
        d = q_ref.shape[2]
        g = chunk_blocks
        nb = idx_ref.shape[-1]
        num_chunks = (count + g - 1) // g
        clean_chunks = clean // g          # fully clean chunks

        def block_dma(buf_slot, lane, block_idx):
            return pltpu.make_async_copy(
                kv_hbm.at[bh, pl.ds(block_idx * block_n, block_n)],
                kv_buf.at[buf_slot, lane],
                sems.at[buf_slot, lane])

        def start_chunk(buf_slot, chunk_idx):
            base = chunk_idx * g
            for lane in range(g):
                pos = jnp.minimum(base + lane, nb - 1)
                block_dma(buf_slot, lane, idx_ref[0, 0, 0, pos]).start()

        @pl.when(count > 0)
        def _():
            start_chunk(0, 0)

        q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(kv_buf.dtype)
        init = (jnp.full((bm, 1), -jnp.inf, jnp.float32),
                jnp.zeros((bm, 1), jnp.float32),
                jnp.zeros((bm, d), jnp.float32))

        def softmax_update(carry, s, v):
            m_prev, l_prev, acc = carry
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            return m_next, l_next, acc

        def body_clean(c, carry):
            buf_slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                start_chunk(1 - buf_slot, c + 1)
            for lane in range(g):
                block_dma(buf_slot, lane, jnp.int32(0)).wait()
            kv = kv_buf[buf_slot]
            k = kv[:, :, :d].reshape(g * block_n, d)
            v = kv[:, :, d:].reshape(g * block_n, d)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return softmax_update(carry, s, v)

        def body_tail(c, carry):
            buf_slot = jax.lax.rem(c, 2)
            base = c * g

            @pl.when(c + 1 < num_chunks)
            def _():
                start_chunk(1 - buf_slot, c + 1)
            lane_cols = []
            for lane in range(g):
                pos = jnp.minimum(base + lane, nb - 1)
                idx = idx_ref[0, 0, 0, pos]
                lane_cols.append(idx * block_n + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_n), 1))
                block_dma(buf_slot, lane, idx).wait()
            cols = jnp.concatenate(lane_cols, axis=1)
            kv = kv_buf[buf_slot]
            k = kv[:, :, :d].reshape(g * block_n, d)
            v = kv[:, :, d:].reshape(g * block_n, d)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            slot_ids = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, g * block_n), 1) // block_n
            valid = slot_ids < count
            valid &= cols < visual_len if text_start is None else (
                (cols < visual_len) |
                ((cols >= text_start) & (cols < text_start + tlen)))
            s = jnp.where(valid, s, MASK_VALUE)
            return softmax_update(carry, s, v)

        carry = jax.lax.fori_loop(0, clean_chunks, body_clean, init)
        m, l, acc = jax.lax.fori_loop(clean_chunks, num_chunks, body_tail,
                                      carry)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)

    return kernel


def build_runs_kernel(block_n, chunk_blocks, sm_scale, visual_len,
                      text_start, max_run):
    """Run-coalesced gather: contiguous selected blocks are fetched with
    ONE DMA descriptor (static-size ladder 1..max_run), cutting issue/wait
    overhead — the decomposition shows the kernel is DMA-skeleton bound."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rectified_spaattn_tpu.kernels.block_sparse import MASK_VALUE

    def kernel(counts_ref, tlen_ref, idx_ref, plen_ref, q_ref, kv_hbm,
               o_ref, kv_buf, sems):
        bh = pl.program_id(0)
        count = counts_ref[0, 0, 0, 0]
        tlen = tlen_ref[0, 0, 0]
        bm = q_ref.shape[1]
        d = q_ref.shape[2]
        g = chunk_blocks
        nb = idx_ref.shape[-1]
        num_chunks = (count + g - 1) // g

        def piece_dma(buf_slot, lane, block_idx, size):
            return pltpu.make_async_copy(
                kv_hbm.at[bh, pl.ds(block_idx * block_n, size * block_n)],
                kv_buf.at[buf_slot, pl.ds(lane * block_n, size * block_n)],
                sems.at[buf_slot, lane])

        def chunk_pieces(buf_slot, chunk_idx, action):
            base = chunk_idx * g
            for lane in range(g):
                pos = jnp.minimum(base + lane, nb - 1)
                plen = plen_ref[0, 0, 0, pos]
                idx = idx_ref[0, 0, 0, pos]
                # pieces never cross the chunk boundary (piece_lengths caps
                # them), but the slice must be in-bounds at trace time too
                for size in range(1, min(max_run, g - lane) + 1):
                    @pl.when(plen == size)
                    def _(lane=lane, idx=idx, size=size):
                        getattr(piece_dma(buf_slot, lane, idx, size),
                                action)()

        chunk_pieces(0, 0, "start")

        q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(kv_buf.dtype)
        init = (jnp.full((bm, 1), -jnp.inf, jnp.float32),
                jnp.zeros((bm, 1), jnp.float32),
                jnp.zeros((bm, d), jnp.float32))

        def body(c, carry):
            m_prev, l_prev, acc = carry
            buf_slot = jax.lax.rem(c, 2)
            base = c * g

            @pl.when(c + 1 < num_chunks)
            def _():
                chunk_pieces(1 - buf_slot, c + 1, "start")

            lane_cols = []
            for lane in range(g):
                pos = jnp.minimum(base + lane, nb - 1)
                idx = idx_ref[0, 0, 0, pos]
                lane_cols.append(idx * block_n + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_n), 1))
            chunk_pieces(buf_slot, c, "wait")
            cols = jnp.concatenate(lane_cols, axis=1)
            kv = kv_buf[buf_slot]                     # [g*bn, 2D]
            k = kv[:, :d]
            v = kv[:, d:]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            slot_ids = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, g * block_n), 1) // block_n
            valid = slot_ids < count
            valid &= cols < visual_len if text_start is None else (
                (cols < visual_len) |
                ((cols >= text_start) & (cols < text_start + tlen)))
            s = jnp.where(valid, s, MASK_VALUE)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            return m_next, l_next, acc

        m, l, acc = jax.lax.fori_loop(0, num_chunks, body, init)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)

    return kernel


def run_twophase_variant(q, k, v, indices, counts, tlen, visual_len,
                         text_start, chunk_blocks=16, iters=4, check=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    s = k.shape[2]
    nq = sq // 128
    nb = indices.shape[-1]
    bh = b * h
    qf = q.reshape(bh, sq, d)
    kv = jnp.concatenate([k.reshape(bh, s, d), v.reshape(bh, s, d)], axis=2)
    cb = visual_len // 128                 # blocks below cb are clean
    slot = jnp.arange(nb, dtype=jnp.int32)
    clean_counts = jnp.sum(
        (indices < cb) & (slot < counts[..., None]), axis=-1).astype(
            jnp.int32)
    print("mean clean frac:",
          float(jnp.mean(clean_counts / jnp.maximum(counts, 1))),
          flush=True)
    idx_f = indices.reshape(bh, nq, 1, nb)
    counts_f = counts.reshape(bh, nq, 1, 1)
    clean_f = clean_counts.reshape(bh, nq, 1, 1)
    tlen_f = jnp.repeat(tlen.astype(jnp.int32), h).reshape(bh, 1, 1)

    kern = build_twophase_kernel(128, chunk_blocks, d ** -0.5, visual_len,
                                 text_start)

    @jax.jit
    def call(qf, kv, counts_f, clean_f, tlen_f, idx_f):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 128, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 128, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_blocks, 128, 2 * d), k.dtype),
                pltpu.SemaphoreType.DMA((2, chunk_blocks)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(counts_f, clean_f, tlen_f, idx_f, qf, kv)

    def sync(x):
        float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))

    out = call(qf, kv, counts_f, clean_f, tlen_f, idx_f)
    sync(out)
    if check:
        from rectified_spaattn_tpu.kernels import block_sparse_flash_attention
        want = block_sparse_flash_attention(
            q, k, v, indices, counts, tlen, visual_len=visual_len,
            text_start=text_start)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32).reshape(want.shape)
            - want.astype(jnp.float32))))
        print("twophase-vs-base max abs err:", err, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(call(qf, kv, counts_f, clean_f, tlen_f, idx_f))
    return (time.perf_counter() - t0) / iters


def run_runs_variant(q, k, v, indices, counts, tlen, visual_len,
                     text_start, chunk_blocks=16, max_run=4, iters=4,
                     check=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    s = k.shape[2]
    nq = sq // 128
    nb = indices.shape[-1]
    bh = b * h
    qf = q.reshape(bh, sq, d)
    kv = jnp.concatenate([k.reshape(bh, s, d), v.reshape(bh, s, d)], axis=2)
    plen = piece_lengths(indices, counts, chunk_blocks, max_run)
    idx_f = indices.reshape(bh, nq, 1, nb)
    plen_f = plen.reshape(bh, nq, 1, nb)
    counts_f = counts.reshape(bh, nq, 1, 1)
    tlen_f = jnp.repeat(tlen.astype(jnp.int32), h).reshape(bh, 1, 1)
    print("pieces/row:", float(jnp.mean(jnp.sum(plen > 0, axis=-1))),
          "blocks/row:", float(jnp.mean(counts)), flush=True)

    kern = build_runs_kernel(128, chunk_blocks, d ** -0.5, visual_len,
                             text_start, max_run)

    @jax.jit
    def call(qf, kv, counts_f, tlen_f, idx_f, plen_f):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 128, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 128, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_blocks * 128, 2 * d), k.dtype),
                pltpu.SemaphoreType.DMA((2, chunk_blocks)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(counts_f, tlen_f, idx_f, plen_f, qf, kv)

    def sync(x):
        float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))

    out = call(qf, kv, counts_f, tlen_f, idx_f, plen_f)
    sync(out)
    if check:
        from rectified_spaattn_tpu.kernels import block_sparse_flash_attention
        want = block_sparse_flash_attention(
            q, k, v, indices, counts, tlen, visual_len=visual_len,
            text_start=text_start)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32).reshape(want.shape)
                                    - want.astype(jnp.float32))))
        print("runs-vs-base max abs err:", err, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(call(qf, kv, counts_f, tlen_f, idx_f, plen_f))
    return (time.perf_counter() - t0) / iters


def run_variant(variant, q, k, v, indices, counts, tlen, visual_len,
                text_start, chunk_blocks=16, iters=4):
    nbuf = 3 if variant.endswith("3") else 2
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    s = k.shape[2]
    nq = sq // 128
    nb = indices.shape[-1]
    bh = b * h
    qf = q.reshape(bh, sq, d)
    kv = jnp.concatenate([k.reshape(bh, s, d), v.reshape(bh, s, d)], axis=2)
    idx_f = indices.reshape(bh, nq, 1, nb)
    counts_f = counts.reshape(bh, nq, 1, 1)
    tlen_f = jnp.repeat(tlen.astype(jnp.int32), h).reshape(bh, 1, 1)

    kern = build_variant_kernel(variant, 128, chunk_blocks, d ** -0.5,
                                visual_len, text_start)

    @jax.jit
    def call(qf, kv, counts_f, tlen_f, idx_f):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 128, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 128, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                (pltpu.VMEM((nbuf, chunk_blocks * 128, 2 * d), k.dtype)
                 if variant == "dmabig" else
                 pltpu.VMEM((nbuf, chunk_blocks, 128, 2 * d), k.dtype)),
                pltpu.SemaphoreType.DMA((nbuf, chunk_blocks)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(counts_f, tlen_f, idx_f, qf, kv)

    def sync(x):
        float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))

    out = call(qf, kv, counts_f, tlen_f, idx_f)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(call(qf, kv, counts_f, tlen_f, idx_f))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str,
                    default="base,dma,compute,nomask,noexp")
    ap.add_argument("--drop", type=float, default=0.8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--check", action="store_true",
                    help="verify runs-variant output against the library "
                         "kernel before timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.sparse import (SparseConfig, select_block_num,
                                              build_sparse_plan)
    from rectified_spaattn_tpu.sparse.ops import mask_to_indices
    from rectified_spaattn_tpu.curves import cached_curve
    from bench_grouped import realistic_qkv

    b, h, d = 1, 24, 128
    lt, lh, lw = 32, 45, 80
    text_len = 256
    sv = lt * lh * lw
    s = sv + text_len

    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    neighbors = jnp.asarray(neighbors)
    cfg = SparseConfig(
        top_k_floor=max(1, select_block_num(args.drop, sv // 128)),
        p_remain=0.3, layout="joint", text_len=text_len)

    q, k, v = realistic_qkv(jax.random.PRNGKey(0), b, h, (lt, lh, lw),
                            text_len, d, jnp.asarray(h2l))
    tlen = jnp.full((b,), text_len, jnp.int32)
    plan = jax.jit(lambda q, k, v: build_sparse_plan(
        q[:, :, :sv], k, v, cfg, neighbor_mask=neighbors,
        text_valid=jnp.ones((b, text_len), bool)))(q, k, v)
    indices, counts = plan.indices, plan.counts
    print("mean count:", float(jnp.mean(counts)), flush=True)

    results = {}
    for variant in args.variants.split(","):
        if variant == "twophase":
            t = run_twophase_variant(q[:, :, :sv], k, v, indices, counts,
                                     tlen, visual_len=sv, text_start=sv,
                                     chunk_blocks=args.chunk,
                                     check=args.check)
        elif variant.startswith("runs"):
            max_run = int(variant[4:]) if len(variant) > 4 else 4
            t = run_runs_variant(q[:, :, :sv], k, v, indices, counts, tlen,
                                 visual_len=sv, text_start=sv,
                                 chunk_blocks=args.chunk, max_run=max_run,
                                 check=args.check)
        else:
            t = run_variant(variant, q[:, :, :sv], k, v, indices, counts,
                            tlen, visual_len=sv, text_start=sv,
                            chunk_blocks=args.chunk)
        results[variant] = round(t * 1e3, 1)
        print(f"{variant}: {t*1e3:.1f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Grouped-row kernel attribution (VERDICT r3 next-round #2).

RESULTS_r2 measured grouped execution SLOWER (G=2: 556 ms vs 507 ms)
despite a modeled 42% HBM-byte saving on a kernel that is byte-bound
(DMA skeleton = 78% of bandwidth).  The single-row kernel got a full
DMA/compute attribution (bench_kernelvars.py); the grouped kernel never
did.  This bench builds the SAME model-statistics mask and times grouped
variants:

  full          production grouped kernel (block_sparse_flash_attention_grouped)
  dma           DMA skeleton only (same copies, no matmuls)
  compute       no DMAs, full compute on stale buffers
  computeclean  every chunk runs the mask-free clean body (isolates
                MXU+softmax at rows = G*128)
  nobias        full kernel minus the per-tile membership bias
                (isolates the rowbits stack/where cost)
  prefetch      full + cross-program chunk-0 prefetch (the single-row
                kernel's measured win, absent from the grouped kernel)

Baselines: the production single-row kernel at the same mask with
prefetch on/off.

Usage: python scripts/bench_groupedvars.py [--small] [--groups 2,4]
       [--variants full,dma,compute,computeclean,nobias,prefetch]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_grouped_variant(variant, group, block_n, chunk_blocks, sm_scale,
                          visual_len, text_start):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rectified_spaattn_tpu.kernels.block_sparse import MASK_VALUE

    block_m = 128

    def kernel(counts_ref, clean_ref, tlen_ref, idx_ref, rowbits_ref,
               nxt_ref, q_ref, kv_hbm, o_ref, kv_buf, sems):
        bh = pl.program_id(0)
        count = counts_ref[0, 0, 0, 0]
        clean = clean_ref[0, 0, 0, 0]
        tlen = tlen_ref[0, 0, 0]
        d = q_ref.shape[2]
        g = chunk_blocks
        rows = group * block_m
        num_chunks = (count + g - 1) // g
        clean_chunks = clean // g
        use_dma = not variant.startswith("compute")
        prefetched = variant == "prefetch"

        def block_dma(buf_slot, lane, block_idx, row=None):
            src = kv_hbm.at[bh if row is None else row,
                            pl.ds(block_idx * block_n, block_n)]
            return pltpu.make_async_copy(
                src, kv_buf.at[buf_slot, pl.ds(lane * block_n, block_n)],
                sems.at[buf_slot, lane])

        def start_chunk(buf_slot, chunk_idx):
            base = chunk_idx * g
            for lane in range(g):
                block_dma(buf_slot, lane,
                          idx_ref[0, 0, 0, base + lane]).start()

        if use_dma and not prefetched:
            @pl.when(count > 0)
            def _():
                start_chunk(0, 0)
        if prefetched:
            # cells after the first rely on the previous cell's epilogue
            # having issued this row's chunk 0 (see epilogue below)
            @pl.when((pl.program_id(1) == 0) & (count > 0))
            def _():
                start_chunk(0, 0)

        q = (q_ref[0].astype(jnp.float32) * sm_scale).astype(kv_buf.dtype)
        init = (jnp.full((rows, 1), -jnp.inf, jnp.float32),
                jnp.zeros((rows, 1), jnp.float32),
                jnp.zeros((rows, d), jnp.float32))

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

        def clean_body(c, carry):
            buf_slot = jax.lax.rem(c, 2)
            if use_dma:
                @pl.when(c + 1 < num_chunks)
                def _():
                    start_chunk(1 - buf_slot, c + 1)
                for lane in range(g):
                    block_dma(buf_slot, lane, jnp.int32(0)).wait()
            if variant == "dma":
                m_prev, l_prev, acc = carry
                acc = acc + kv_buf[buf_slot, :1, :d].astype(jnp.float32)
                return m_prev, l_prev, acc
            kv = kv_buf[buf_slot]
            return softmax_update(carry, jax.lax.dot_general(
                q, kv[:, :d], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32), kv[:, d:])

        def tail_body(c, carry):
            if variant in ("dma", "computeclean"):
                return clean_body(c, carry)
            buf_slot = jax.lax.rem(c, 2)
            base = c * g
            if use_dma:
                @pl.when(c + 1 < num_chunks)
                def _():
                    start_chunk(1 - buf_slot, c + 1)
            lane_cols = []
            bias_parts = [[] for _ in range(group)]
            for lane in range(g):
                pos = base + lane
                idx = idx_ref[0, 0, 0, pos]
                bits = rowbits_ref[0, 0, 0, pos]
                lane_cols.append(
                    idx * block_n + jax.lax.broadcasted_iota(
                        jnp.int32, (1, block_n), 1))
                if variant != "nobias":
                    for r in range(group):
                        member = (bits & (1 << r)) > 0
                        bias_parts[r].append(jnp.broadcast_to(
                            jnp.where(member, 0.0, MASK_VALUE),
                            (1, block_n)))
                if use_dma:
                    block_dma(buf_slot, lane, idx).wait()
            cols = jnp.concatenate(lane_cols, axis=1)
            kv = kv_buf[buf_slot]
            s = jax.lax.dot_general(
                q, kv[:, :d], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if variant != "nobias":
                bias = jnp.stack(
                    [jnp.concatenate(p, axis=1) for p in bias_parts],
                    axis=0)
                s = (s.reshape(group, block_m, g * block_n) + bias
                     ).reshape(rows, g * block_n)
            slot_ids = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, g * block_n), 1) // block_n
            valid = slot_ids < count
            valid &= cols < visual_len if text_start is None else (
                (cols < visual_len) |
                ((cols >= text_start) & (cols < text_start + tlen)))
            s = jnp.where(valid, s, MASK_VALUE)
            return softmax_update(carry, s, kv[:, d:])

        carry = jax.lax.fori_loop(0, clean_chunks, clean_body, init)
        m, l, acc = jax.lax.fori_loop(clean_chunks, num_chunks, tail_body,
                                      carry)
        if prefetched:
            # epilogue: issue the NEXT cell's chunk 0 (same bh, next group
            # row) so its first DMAs overlap this cell's last compute
            ngrp = nxt_ref.shape[1]
            nxt = pl.program_id(1) + 1   # hoisted: program_id inside a
            # pl.when body does not lower in interpret mode

            @pl.when(nxt < ngrp)
            def _():
                for lane in range(g):
                    pltpu.make_async_copy(
                        kv_hbm.at[bh, pl.ds(
                            nxt_ref[0, nxt, 0, lane] * block_n, block_n)],
                        kv_buf.at[0, pl.ds(lane * block_n, block_n)],
                        sems.at[0, lane]).start()
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)

    return kernel


def run_grouped_variant(variant, q, k, v, mask, tlen, visual_len,
                        text_start, group, chunk_blocks=16, iters=4,
                        check=False, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rectified_spaattn_tpu.sparse.ops import group_rows
    from rectified_spaattn_tpu.kernels.block_sparse import _pad_slots

    b, h, sq, d = q.shape
    s = k.shape[2]
    bh = b * h
    block_n = 128
    qf = q.reshape(bh, sq, d)
    kv = jnp.concatenate([k.reshape(bh, s, d), v.reshape(bh, s, d)], axis=2)
    indices, counts, rowbits, clean = group_rows(
        mask, group, clean_blocks=visual_len // block_n)
    (indices, rowbits), nb = _pad_slots((indices, rowbits), chunk_blocks)
    ngrp = indices.shape[2]
    idx_f = indices.reshape(bh, ngrp, 1, nb)
    bits_f = rowbits.reshape(bh, ngrp, 1, nb)
    counts_f = counts.reshape(bh, ngrp, 1, 1)
    clean_f = clean.astype(jnp.int32).reshape(bh, ngrp, 1, 1)
    tlen_f = jnp.repeat(tlen.astype(jnp.int32), h).reshape(bh, 1, 1)
    # chunk-0 index lists for the prefetch epilogue, one row per group-row
    nxt_f = idx_f[..., :chunk_blocks]

    kern = build_grouped_variant(variant, group, block_n, chunk_blocks,
                                 d ** -0.5, visual_len, text_start)
    rows = group * 128

    @jax.jit
    def call(qf, kv, counts_f, clean_f, tlen_f, idx_f, bits_f, nxt_f):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            grid=(bh, ngrp),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ngrp, 1, chunk_blocks),
                             lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, rows, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, rows, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_blocks * block_n, 2 * d), k.dtype),
                pltpu.SemaphoreType.DMA((2, chunk_blocks)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(counts_f, clean_f, tlen_f, idx_f, bits_f, nxt_f, qf, kv)

    def sync(x):
        float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))

    out = call(qf, kv, counts_f, clean_f, tlen_f, idx_f, bits_f, nxt_f)
    sync(out)
    if check and variant in ("full", "prefetch"):
        from rectified_spaattn_tpu.sparse.ops import mask_to_indices
        from rectified_spaattn_tpu.kernels import (
            block_sparse_flash_attention)
        idx1, cnt1 = mask_to_indices(mask)
        want = block_sparse_flash_attention(
            q, k, v, idx1, cnt1, tlen, visual_len=visual_len,
            text_start=text_start, interpret=interpret)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32).reshape(want.shape)
            - want.astype(jnp.float32))))
        print(f"{variant} g={group} vs single-row max abs err: {err}",
              flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(call(qf, kv, counts_f, clean_f, tlen_f, idx_f, bits_f, nxt_f))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--groups", default="2,4")
    ap.add_argument("--variants",
                    default="full,dma,compute,computeclean,nobias,prefetch")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--drop", type=float, default=0.8)
    ap.add_argument("--chunk_blocks", type=int, default=16,
                    help="grouped kernel chunk size (RESULTS_r2 measured "
                         "grouped at 16)")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode smoke test (timings invalid)")
    args = ap.parse_args()
    if args.interpret:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.sparse import (SparseConfig,
                                              select_block_num,
                                              build_sparse_plan)
    from rectified_spaattn_tpu.sparse.ops import mask_to_indices
    from rectified_spaattn_tpu.kernels import block_sparse_flash_attention
    from rectified_spaattn_tpu.curves import cached_curve
    from exp_runstats import smooth_inputs

    b, h, d = 1, 24, 128
    lt, lh, lw = (8, 24, 32) if args.small else (32, 45, 80)
    text_len = 256
    sv = lt * lh * lw
    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    neighbors = jnp.asarray(neighbors)
    img_blocks = sv // 128

    rng = jax.random.PRNGKey(0)
    lin = np.asarray(h2l)
    tt, hh, ww = np.unravel_index(lin, (lt, lh, lw))
    coords = jnp.asarray(np.stack([tt / lt, hh / lh, ww / lw], -1),
                         jnp.float32)
    q, k = smooth_inputs(rng, b, h, sv, text_len, d, coords, 4.0, 1.0)
    v = k
    tlen = jnp.full((b,), text_len, jnp.int32)

    cfg0 = SparseConfig(
        top_k_floor=max(1, select_block_num(args.drop, img_blocks)),
        p_remain=0.3, layout="joint", text_len=text_len)
    plan = jax.jit(lambda q, k, v: build_sparse_plan(
        q[:, :, :sv], k, v, cfg0, neighbor_mask=neighbors,
        text_valid=jnp.ones((b, text_len), bool)))(q, k, v)
    mask = plan.block_mask
    counts = np.asarray(mask).sum(-1)
    print(f"density {counts.mean() / mask.shape[-1]:.4f} "
          f"mean_count {counts.mean():.1f}", flush=True)

    def sync(x):
        float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))

    results = {}
    qv = q[:, :, :sv]           # kernel-level timing: planned visual rows
    # single-row baselines
    idx1, cnt1 = mask_to_indices(mask)
    for pf in (True, False):
        fn = jax.jit(functools.partial(
            block_sparse_flash_attention, visual_len=sv,
            text_start=sv, prefetch_next=pf, interpret=args.interpret))
        sync(fn(qv, k, v, idx1, cnt1, tlen))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            sync(fn(qv, k, v, idx1, cnt1, tlen))
        t = (time.perf_counter() - t0) / args.iters
        results[f"g1_prefetch{int(pf)}"] = round(t * 1e3, 1)
        print(f"g1 prefetch={pf}: {t*1e3:.1f} ms", flush=True)

    for g in (int(x) for x in args.groups.split(",")):
        for variant in args.variants.split(","):
            t = run_grouped_variant(
                variant, qv, k, v, mask, tlen, sv, sv, group=g,
                chunk_blocks=args.chunk_blocks, iters=args.iters,
                check=args.check, interpret=args.interpret)
            results[f"g{g}_{variant}"] = round(t * 1e3, 1)
            print(f"g{g} {variant}: {t*1e3:.1f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

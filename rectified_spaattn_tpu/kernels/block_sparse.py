"""Pallas TPU block-sparse flash attention (the framework's hot kernel).

TPU-native replacement for the reference Triton kernel
``_triton_block_sparse_attn_fwd_kernel_onehot``
(reference: rectified_hunyuan_attn.py:15-168).  Same contract — each
(batch·head, query-block) attends to a dynamic, data-dependent set of
128-token key/value blocks with an online softmax — but a different
machine mapping tuned for TPU cost structure:

  * The mask is pre-compacted to per-row index lists
    (sparse/ops.py:mask_to_indices); the kernel gathers exactly the
    selected KV tiles from HBM (the paged-attention pattern), so compute
    AND HBM traffic scale with the kept-block count — unlike the Triton
    kernel, which streams every block and branches (:67-70).
  * Selected blocks are processed in chunks of ``chunk_blocks`` (default 16):
    one online-softmax update and one pair of MXU matmuls per chunk instead
    of per block.  A 128×128 tile-pair is only ~43 ns of MXU work, so
    per-block loop/DMA/softmax overhead would dominate at chunk size 1
    (measured: ~10× overhead, no win over dense flash).
  * K and V are packed along the lane dimension ([S, 2·D] with K in lanes
    [:D] and V in lanes [D:]) so each block is ONE contiguous DMA instead
    of two — descriptor issue overhead halves — and the in-VMEM split is a
    free tile-aligned slice (a per-token interleave would force a stride-2
    sublane gather, measured 5× slower than unchunked).
  * Chunk buffers are double-buffered: chunk c+1's DMAs are issued before
    waiting on chunk c.
  * One 128-token block per DMA descriptor.  Run-coalescing contiguous
    indices into bigger descriptors was measured and REJECTED: the DMA
    skeleton runs at ~78% of HBM bandwidth already (it is byte-bound, not
    descriptor-bound), and the static branch ladder the dynamic run sizes
    require costs more scalar work than it saves (runs4/8/16 variants:
    639/778/898 ms vs 531 ms base at the Hunyuan point —
    scripts/bench_kernelvars.py).
  * Softmax statistics are carried as fori_loop values (m, l, acc in fp32);
    every grid cell is independent ("parallel"-safe).
  * Key validity is evaluated in-kernel from a static visual prefix plus a
    runtime text window, replacing the reference's seqlen prefix test
    (:86-87) which cannot express a padded [visual | pad | text | pad]
    layout.
  * Two-phase chunk loop: slots are ordered so every window-sensitive
    block (padded boundary visual block, text blocks) lands at the END;
    leading chunks run a mask-free body with no per-lane scalar reads.
  * Grouped-row variant: ``group`` query blocks share one program and
    gather the UNION of their key sets once — HBM bytes drop by
    group/union_growth (measured 2/1.154 at G=2 on model-statistics
    masks) while per-row membership is re-imposed exactly.  Union slots
    are ordered [all-member ∧ window-clean | rest], so the clean prefix
    pays NO masking and the tail imposes membership as a per-(row-block,
    slot) TILE bias (the planned mask is constant over 128×128 tiles) —
    not the per-element integer test that made the round-1 grouped kernel
    lose its bandwidth win to VPU work.

Block size 128×128 matches both the algorithm's mask granularity and the
MXU systolic array.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _slot_scales(sk_ref, sv_ref, base, g, block_n):
    """Per-slot fp32 K/V dequant scales as LANE vectors [1, g*bn].

    Scales are per SLOT (gathered to row order by the wrapper), constant
    over each 128-token block.  Both are folded into fp32 tiles AFTER the
    MXU dots (K scale onto the score tile, V scale onto the probability
    tile) so no bf16 rounding of the scale itself occurs and the int8
    payload feeds the MXU without a per-element rescale."""
    k_parts, v_parts = [], []
    for lane in range(g):
        k_parts.append(jnp.broadcast_to(
            sk_ref[0, 0, 0, base + lane], (1, block_n)))
        v_parts.append(jnp.broadcast_to(
            sv_ref[0, 0, 0, base + lane], (1, block_n)))
    ksc = jnp.concatenate(k_parts, axis=1)               # [1, g*bn]
    vsc = jnp.concatenate(v_parts, axis=1)               # [1, g*bn]
    return ksc, vsc


def _sparse_attn_kernel(
    # SMEM inputs (trailing block dims equal the array dims — required by
    # the Pallas TPU lowering for sub-(8,128) blocks)
    counts_ref,      # [1, 1, 1, 1]  int32  — kept blocks for this (bh, q)
    clean_ref,       # [1, 1, 1, 1]  int32  — leading mask-free slot count
    tlen_ref,        # [1, 1, 1]     int32  — runtime effective text length
    idx_ref,         # [1, 1, 1, NB] int32  — compacted key-block indices
    *rest,           # with prefetch: (counts_next_ref [1,1,1,1],
                     # idx_next_ref [1,1,1,NB] — the NEXT query row's
                     # slots); with quant: (sk_ref, sv_ref) [1,1,1,NB]
                     # fp32 per-slot absmax/127 scales; then
                     # q_ref [1, bm, D] VMEM, kv_hbm [BH, S, 2*D] ANY
                     # (int8 when quant), o_ref, and with return_stats
                     # (m_ref, l_ref) [1, bm, 128] VMEM, then scratch
    block_n: int,
    chunk_blocks: int,
    sm_scale: float,
    visual_len: int,     # static: tokens < visual_len are valid
    text_start: int | None,  # static: text region offset (None = no text)
    return_stats: bool = False,
    quant: str | None = None,   # None | "int8" (bf16-convert) | "mxu8"
    prefetch: bool = False,
):
    """Two-phase chunk loop: the ascending compacted index list puts every
    window-sensitive block (padded boundary visual block, text blocks) at
    the END, so the leading ``clean`` slots run a mask-free body with no
    per-lane scalar reads; only the 1-2 tail chunks pay for column
    coordinates and window tests (measured bit-exact vs the single-phase
    kernel on realistic masks).

    ``prefetch``: each cell issues the NEXT query row's chunk-0 DMAs
    into buffer slot 0 at its end (same bh only — the row grid dim is
    "arbitrary", so same-bh cells run sequentially on one core),
    eliminating the per-row pipeline-restart bubble where the DMA engine
    idles while the row's last chunks compute.  The prologue then only
    issues for row 0; a zero-count NEXT row is not prefetched (guard),
    and a zero-count cell still prefetches for its successor, so every
    count>0 cell gets exactly one chunk-0 issue."""
    if prefetch:
        counts_next_ref, idx_next_ref, *rest = rest
    if quant:
        sk_ref, sv_ref, *rest = rest
    q_ref, kv_hbm, o_ref, *rest = rest
    if return_stats:
        m_ref, l_ref, kv_buf, sems = rest
    else:
        kv_buf, sems = rest
    bh = pl.program_id(0)
    count = counts_ref[0, 0, 0, 0]
    clean = clean_ref[0, 0, 0, 0]
    tlen = tlen_ref[0, 0, 0]
    bm = q_ref.shape[1]
    d = q_ref.shape[2]
    g = chunk_blocks
    num_chunks = (count + g - 1) // g
    clean_chunks = clean // g        # chunks fully below the dirty tail

    # NB is padded to a chunk multiple by the wrapper (pad slots: idx 0),
    # so every lane of every issued chunk carries exactly one DMA — no
    # clamping, and the buffer never holds stale lanes (pad-lane scores
    # are masked by the slot < count test).
    def block_dma(buf_slot, lane, block_idx):
        return pltpu.make_async_copy(
            kv_hbm.at[bh, pl.ds(block_idx * block_n, block_n)],
            kv_buf.at[buf_slot, pl.ds(lane * block_n, block_n)],
            sems.at[buf_slot, lane])

    def start_chunk(buf_slot, chunk_idx):
        base = chunk_idx * g
        for lane in range(g):
            block_dma(buf_slot, lane, idx_ref[0, 0, 0, base + lane]).start()

    # Zero-count rows (ring SP shards can own none of a row's blocks) must
    # not issue prologue DMAs: the fori_loop below never runs, so nothing
    # would wait them and the scratch semaphores would carry stale
    # completions into the next grid cell.
    if prefetch:
        # rows > 0 received their chunk 0 from the previous cell's
        # epilogue prefetch (see docstring)
        @pl.when((count > 0) & (pl.program_id(1) == 0))
        def _():
            start_chunk(0, 0)
    else:
        @pl.when(count > 0)
        def _():
            start_chunk(0, 0)

    if quant == "mxu8":
        # q is quantized IN-KERNEL per row (absmax over D); both MXU dots
        # then run int8 x int8 -> int32 directly on the gathered payload —
        # no per-chunk dequant relayout (the failure mode that sank the
        # round-2 bf16-convert int8 path, RESULTS_r2.md).  All scales are
        # folded into fp32 tiles: qsc·sm_scale·ksc onto the score tile,
        # vsc onto p (with a per-row dynamic p quantization whose scale
        # folds into the fp32 accumulator).
        qf = q_ref[0].astype(jnp.float32)
        qmax = jnp.max(jnp.abs(qf), axis=1, keepdims=True)       # [bm, 1]
        q = jnp.round(
            qf * (127.0 / jnp.maximum(qmax, 1e-30))).astype(jnp.int8)
        row_scale = qmax * (sm_scale / 127.0)                    # [bm, 1]
    else:
        q = q_ref[0].astype(jnp.float32) * sm_scale
        q = q.astype(jnp.bfloat16 if quant else kv_buf.dtype)
        row_scale = None

    init = (
        jnp.full((bm, 1), -jnp.inf, jnp.float32),       # running max m
        jnp.zeros((bm, 1), jnp.float32),                # running sum l
        jnp.zeros((bm, d), jnp.float32),                # output accumulator
    )

    def softmax_update(carry, s, v, v_scale=None):
        m_prev, l_prev, acc = carry
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        if quant == "mxu8":
            # int8 V: fold the per-block V scale into p, then quantize p
            # per row against its running chunk max so the p@v dot is
            # int8 x int8; the p scale folds into the fp32 accumulator.
            pq = p * v_scale                             # [bm, g*bn]
            pm = jnp.max(pq, axis=1, keepdims=True)      # [bm, 1]
            p8 = jnp.round(
                pq * (127.0 / jnp.maximum(pm, 1e-30))).astype(jnp.int8)
            acc_i = jax.lax.dot(p8, v, preferred_element_type=jnp.int32)
            acc = acc * alpha + acc_i.astype(jnp.float32) * (pm / 127.0)
            return m_next, l_next, acc
        if v_scale is not None:
            # int8 V: x ~= v_int8 * scale, folded into p so V needs no
            # per-element rescale before the MXU dot
            p = p * v_scale
        acc = acc * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_next, l_next, acc

    def chunk_scores(kv, base):
        """MXU scores + per-mode dequant folding -> (s fp32, v, vsc)."""
        if quant == "mxu8":
            k = kv[:, :d]                                # int8
            v = kv[:, d:]
            ksc, vsc = _slot_scales(sk_ref, sv_ref, base, g, block_n)
            s_i = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)        # [bm, g*bn] int32
            s = s_i.astype(jnp.float32) * row_scale * ksc
            return s, v, vsc
        if quant:
            # legacy int8 mode: K converts to bf16 (costly sublane
            # relayout — kept for parts where the convert is free); the
            # fp32 K scale folds into the score tile, not into bf16 K
            k = kv[:, :d].astype(jnp.bfloat16)
            v = kv[:, d:].astype(jnp.bfloat16)
            ksc, vsc = _slot_scales(sk_ref, sv_ref, base, g, block_n)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * ksc
            return s, v, vsc
        k = kv[:, :d]
        v = kv[:, d:]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return s, v, None

    def body_clean(c, carry):
        buf_slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            start_chunk(1 - buf_slot, c + 1)
        for lane in range(g):
            # waits only need the copy SIZE (the semaphore amount), not
            # the source address — no idx reads in the clean body
            block_dma(buf_slot, lane, jnp.int32(0)).wait()
        s, v, vsc = chunk_scores(kv_buf[buf_slot], c * g)
        return softmax_update(carry, s, v, vsc)

    def body_tail(c, carry):
        buf_slot = jax.lax.rem(c, 2)
        base = c * g

        @pl.when(c + 1 < num_chunks)
        def _():
            start_chunk(1 - buf_slot, c + 1)

        # Column coordinates of every gathered key, per lane (static unroll).
        lane_cols = []
        for lane in range(g):
            idx = idx_ref[0, 0, 0, base + lane]
            lane_cols.append(idx * block_n + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_n), 1))
            block_dma(buf_slot, lane, idx).wait()
        cols = jnp.concatenate(lane_cols, axis=1)        # [1, g*bn]

        s, v, vsc = chunk_scores(kv_buf[buf_slot], base)  # s: [bm, g*bn]

        # Validity: real slot (not chunk padding) ∧ token-level key window.
        slot_ids = base + jax.lax.broadcasted_iota(
            jnp.int32, (1, g * block_n), 1) // block_n
        valid = slot_ids < count
        valid &= cols < visual_len if text_start is None else (
            (cols < visual_len) |
            ((cols >= text_start) & (cols < text_start + tlen)))
        s = jnp.where(valid, s, MASK_VALUE)
        return softmax_update(carry, s, v, vsc)

    carry = jax.lax.fori_loop(0, clean_chunks, body_clean, init)
    m, l, acc = jax.lax.fori_loop(clean_chunks, num_chunks, body_tail,
                                  carry)
    if prefetch:
        # epilogue: start the NEXT row's chunk 0 so its DMAs overlap this
        # cell's output write and the inter-cell transition (both loops
        # above have completed, so buffer slot 0 is free to overwrite)
        @pl.when((pl.program_id(1) + 1 < pl.num_programs(1))
                 & (counts_next_ref[0, 0, 0, 0] > 0))
        def _():
            for lane in range(g):
                block_dma(0, lane, idx_next_ref[0, 0, 0, lane]).start()
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (acc * l_inv).astype(o_ref.dtype)
    if return_stats:
        bm = q_ref.shape[1]
        m_ref[0] = jnp.broadcast_to(m, (bm, 128))
        l_ref[0] = jnp.broadcast_to(l, (bm, 128))


def _sparse_attn_kernel_grouped(
    # SMEM inputs
    counts_ref,      # [1, 1, 1, 1]  int32  — union kept-block count
    clean_ref,       # [1, 1, 1, 1]  int32  — all-member ∧ window-clean prefix
    tlen_ref,        # [1, 1, 1]     int32
    idx_ref,         # [1, 1, 1, NB] int32  — union block indices (clean 1st)
    rowbits_ref,     # [1, 1, 1, NB] int32  — bit r set: row r's planned set
    # VMEM / HBM inputs
    q_ref,           # [1, G*bm, D]  VMEM — G query blocks
    kv_hbm,          # [BH, S, 2*D]  ANY
    # outputs
    o_ref,           # [1, G*bm, D]  VMEM
    # scratch
    kv_buf,          # [2, g*bn, 2*D] VMEM
    sems,
    *,
    group: int,
    block_m: int,
    block_n: int,
    chunk_blocks: int,
    sm_scale: float,
    visual_len: int,
    text_start: int | None,
):
    """``group`` query-block rows per program over the UNION of their
    planned key sets — HBM traffic drops by group/union_growth because
    adjacent Gilbert rows select heavily overlapping keys, and the DMA
    skeleton is byte-bound (78% of HBM bandwidth, bench_kernelvars.py).

    Union slots arrive partitioned [all-member ∧ window-clean | tail], so
    the leading chunks run the mask-free body.  Tail chunks re-impose the
    planned mask exactly: membership is constant over (row-block,
    key-block) TILES, so it enters as a [G, g] additive bias broadcast
    onto the reshaped score tile (scalar work per chunk: G·g bit tests) —
    token-level window validity is the only per-element test."""
    bh = pl.program_id(0)
    count = counts_ref[0, 0, 0, 0]
    clean = clean_ref[0, 0, 0, 0]
    tlen = tlen_ref[0, 0, 0]
    d = q_ref.shape[2]
    g = chunk_blocks
    rows = group * block_m
    num_chunks = (count + g - 1) // g
    clean_chunks = clean // g

    def block_dma(buf_slot, lane, block_idx):
        return pltpu.make_async_copy(
            kv_hbm.at[bh, pl.ds(block_idx * block_n, block_n)],
            kv_buf.at[buf_slot, pl.ds(lane * block_n, block_n)],
            sems.at[buf_slot, lane])

    def start_chunk(buf_slot, chunk_idx):
        base = chunk_idx * g
        for lane in range(g):
            block_dma(buf_slot, lane, idx_ref[0, 0, 0, base + lane]).start()

    # see _sparse_attn_kernel: no prologue DMA for zero-count rows
    @pl.when(count > 0)
    def _():
        start_chunk(0, 0)

    q = q_ref[0].astype(jnp.float32) * sm_scale
    q = q.astype(kv_buf.dtype)

    init = (
        jnp.full((rows, 1), -jnp.inf, jnp.float32),
        jnp.zeros((rows, 1), jnp.float32),
        jnp.zeros((rows, d), jnp.float32),
    )

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
        k = kv[:, :d]
        v = kv[:, d:]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return softmax_update(carry, s, v)

    def body_tail(c, carry):
        buf_slot = jax.lax.rem(c, 2)
        base = c * g

        @pl.when(c + 1 < num_chunks)
        def _():
            start_chunk(1 - buf_slot, c + 1)

        lane_cols = []
        bias_parts = [[] for _ in range(group)]   # [G][g of [1, bn]]
        for lane in range(g):
            pos = base + lane
            idx = idx_ref[0, 0, 0, pos]
            bits = rowbits_ref[0, 0, 0, pos]
            lane_cols.append(idx * block_n + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_n), 1))
            for r in range(group):
                member = (bits & (1 << r)) > 0
                bias_parts[r].append(jnp.broadcast_to(
                    jnp.where(member, 0.0, MASK_VALUE), (1, block_n)))
            block_dma(buf_slot, lane, idx).wait()
        cols = jnp.concatenate(lane_cols, axis=1)          # [1, g*bn]
        # [G, 1, g*bn] additive membership bias — lane-major so the score
        # reshape below splits only the SUBLANE dim (no lane relayout)
        bias = jnp.stack(
            [jnp.concatenate(p, axis=1) for p in bias_parts], axis=0)

        kv = kv_buf[buf_slot]
        k = kv[:, :d]
        v = kv[:, d:]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [rows, g*bn]

        # planned-set membership: constant per (row-block, key-block) tile
        s = (s.reshape(group, block_m, g * block_n) + bias).reshape(
            rows, g * block_n)

        slot_ids = base + jax.lax.broadcasted_iota(
            jnp.int32, (1, g * block_n), 1) // block_n
        valid_tok = slot_ids < count
        valid_tok &= cols < visual_len if text_start is None else (
            (cols < visual_len) |
            ((cols >= text_start) & (cols < text_start + tlen)))
        s = jnp.where(valid_tok, s, MASK_VALUE)
        return softmax_update(carry, s, v)

    carry = jax.lax.fori_loop(0, clean_chunks, body_clean, init)
    _, l, acc = jax.lax.fori_loop(clean_chunks, num_chunks, body_tail,
                                  carry)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (acc * l_inv).astype(o_ref.dtype)


def _pad_slots(arrs, chunk_blocks: int):
    """Pad the slot axis of (indices, ...) to a chunk multiple so every
    lane of every issued chunk has a slot to read (pad idx 0; pad scores
    are masked by slot < count)."""
    nb = arrs[0].shape[-1]
    pad = (-nb) % chunk_blocks
    if not pad:
        return arrs, nb
    lead = [(0, 0)] * (arrs[0].ndim - 1)
    return tuple(jnp.pad(a, lead + [(0, pad)]) for a in arrs), nb + pad


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "sm_scale",
                     "visual_len", "text_start", "chunk_blocks",
                     "interpret"))
def block_sparse_flash_attention_grouped(
    q: jax.Array,          # [B, H, Sq, D]  (Sq % (group*block_m) == 0)
    k: jax.Array,
    v: jax.Array,
    indices: jax.Array,    # [B, H, NQ/G, NB] union block ids (clean first)
    counts: jax.Array,     # [B, H, NQ/G]
    rowbits: jax.Array,    # [B, H, NQ/G, NB] int32 membership bits
    clean: jax.Array,      # [B, H, NQ/G] int32 clean-prefix slot count
    text_len: jax.Array,   # [B] int32
    *,
    group: int,
    visual_len: int,
    text_start: int | None,
    block_m: int = 128,
    block_n: int = 128,
    chunk_blocks: int = 16,
    sm_scale: float | None = None,
    interpret: bool = False,
    packed_kv: jax.Array | None = None,   # [B,H,S,2D] pre-packed KV
) -> jax.Array:
    """Grouped-row variant: see sparse/ops.py::group_rows.

    ``packed_kv``: producer-packed [K|V] stream — the grouped kernel
    gathers from it directly instead of materialising its own packed
    copy, exactly like the single-row wrapper (k/v args then only feed
    shapes).  The kernel window-masks every non-clean block's scores and
    the clean prefix is clamped to fully-valid visual blocks, so
    kernel-side validity zeroing is unnecessary."""
    b, h, sq, d = q.shape
    s = k.shape[2]
    ngrp = indices.shape[2]
    assert sq == ngrp * group * block_m, (sq, ngrp, group, block_m)
    assert 1 <= group <= 32, group    # rowbits is int32
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    bh = b * h
    qf = q.reshape(bh, sq, d)
    if packed_kv is not None:
        kv = packed_kv.reshape(bh, s, 2 * d)
    else:
        kv = jnp.concatenate([k.reshape(bh, s, d), v.reshape(bh, s, d)],
                             axis=2)
    # Defensively clamp the caller-supplied clean prefix to what the slot
    # data actually supports (all-member ∧ fully inside the visual window
    # ∧ within count), mirroring the single-row wrapper: a bad caller then
    # degrades to the fully-masked tail path instead of mis-skipping the
    # membership/window masks.
    cb = visual_len // block_n
    slot = jnp.arange(indices.shape[-1], dtype=jnp.int32)
    dirty = ((indices >= cb) | (slot >= counts[..., None])
             | (rowbits != (1 << group) - 1))
    clean_re = jnp.sum(jnp.cumsum(dirty.astype(jnp.int32), axis=-1) == 0,
                       axis=-1)
    clean = jnp.minimum(clean.astype(jnp.int32), clean_re.astype(jnp.int32))
    (indices, rowbits), nb = _pad_slots((indices, rowbits), chunk_blocks)
    idx_f = indices.reshape(bh, ngrp, 1, nb)
    bits_f = rowbits.reshape(bh, ngrp, 1, nb)
    counts_f = counts.reshape(bh, ngrp, 1, 1)
    clean_f = clean.astype(jnp.int32).reshape(bh, ngrp, 1, 1)
    tlen_f = jnp.repeat(text_len.astype(jnp.int32), h).reshape(bh, 1, 1)

    kernel = functools.partial(
        _sparse_attn_kernel_grouped,
        group=group,
        block_m=block_m,
        block_n=block_n,
        chunk_blocks=chunk_blocks,
        sm_scale=sm_scale,
        visual_len=visual_len,
        text_start=text_start,
    )

    rows = group * block_m
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=(bh, ngrp),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),            # counts
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),            # clean prefix
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),            # text_len
            pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),            # indices
            pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),            # rowbits
            pl.BlockSpec((1, rows, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),            # q (G rows)
            pl.BlockSpec(memory_space=pl.ANY),                # packed KV
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_blocks * block_n, 2 * d), kv.dtype),
            pltpu.SemaphoreType.DMA((2, chunk_blocks)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(counts_f, clean_f, tlen_f, idx_f, bits_f, qf, kv)
    return out.reshape(b, h, sq, d)


def block_sparse_flash_attention_paired(q, k, v, indices, counts, rowbits,
                                        clean, text_len, **kw):
    """Two rows per program — the group=2 special case (kept as the name
    the round-1 API exported)."""
    return block_sparse_flash_attention_grouped(
        q, k, v, indices, counts, rowbits, clean, text_len, group=2, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "sm_scale", "visual_len",
                     "text_start", "chunk_blocks", "interpret",
                     "return_stats", "quant_mode", "prefetch_next"))
def block_sparse_flash_attention(
    q: jax.Array,          # [B, H, Sq, D]   (Sq % block_m == 0)
    k: jax.Array,          # [B, H, S,  D]
    v: jax.Array,          # [B, H, S,  D]
    indices: jax.Array,    # [B, H, NQ, NB] int32 compacted block ids
    counts: jax.Array,     # [B, H, NQ]     int32
    text_len: jax.Array,   # [B]            int32 runtime effective text len
    *,
    visual_len: int,             # static true visual token count
    text_start: int | None,      # static text-region offset (None = no text)
    block_m: int = 128,
    block_n: int = 128,
    chunk_blocks: int = 16,
    sm_scale: float | None = None,
    interpret: bool = False,
    return_stats: bool = False,
    kv_quant=None,
    quant_mode: str | None = None,
    prefetch_next: bool = True,
    packed_kv: jax.Array | None = None,   # [B,H,S,2D] pre-packed KV
):
    """Run masked flash attention over the selected key blocks.

    Returns [B, H, Sq, D] in q.dtype — the softmax-normalised sparse
    output (rectification is applied by the caller, attention/rectified.py).
    With ``return_stats`` also returns the per-row online-softmax running
    max m and sum l ([B, H, Sq] fp32) so partial results over disjoint key
    sets can be merged exactly (ring sequence parallelism,
    attention/ring.py).

    ``kv_quant``: optional (kv_int8 [B*H, S, 2D], scale_k [B,H,NBtot],
    scale_v [B,H,NBtot]) from sparse/ops.py::quantize_kv_blocks — the
    gather streams int8 KV (half the HBM bytes of the byte-bound kernel).
    ``quant_mode`` selects how the int8 payload is consumed:
      * "int8": per-chunk convert to bf16 before the MXU dots (forces a
        VMEM sublane relayout — measured SLOWER than bf16 gathers on
        v5e, RESULTS_r2.md; kept for parts where the convert is free);
      * "mxu8": int8 feeds the MXU directly (int8 x int8 -> int32) with
        q and p quantized in-kernel and every scale folded into fp32
        score/accumulator tiles — no relayout, half the HBM bytes.
    ``k``/``v`` are then only consulted for shapes.
    """
    b, h, sq, d = q.shape
    s = k.shape[2]
    nq = sq // block_m
    assert s % block_n == 0 and sq % block_m == 0
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    bh = b * h
    qf = q.reshape(bh, sq, d)
    assert kv_quant is None or packed_kv is None, (
        "kv_quant already carries a packed payload")
    if kv_quant is not None and quant_mode is None:
        quant_mode = "int8"
    assert (kv_quant is None) == (quant_mode is None), (
        "kv_quant payload and quant_mode must be given together")
    if kv_quant is not None:
        kv, scale_k, scale_v = kv_quant
        kv_dtype = kv.dtype
        nbt = scale_k.shape[-1]
        gather = lambda sc: jnp.take_along_axis(
            jnp.broadcast_to(sc[:, :, None, :], (b, h, nq, nbt)),
            indices, axis=-1)
        sk_rows = gather(scale_k)
        sv_rows = gather(scale_v)
    elif packed_kv is not None:
        # producer-packed [K|V]: avoids materialising the packed copy
        # NEXT TO the unpacked k/v — the long-context memory saver
        # (k/v args are then only consulted for shapes; token-window
        # masking makes kernel-side validity zeroing unnecessary)
        kv = packed_kv.reshape(bh, s, 2 * d)
        kv_dtype = packed_kv.dtype
    else:
        kv = jnp.concatenate([k.reshape(bh, s, d), v.reshape(bh, s, d)],
                             axis=2)
        kv_dtype = k.dtype
    counts_f = counts.reshape(bh, nq, 1, 1)
    tlen_f = jnp.repeat(text_len.astype(jnp.int32), h).reshape(bh, 1, 1)

    # Leading mask-free prefix per row (two-phase split): slots whose block
    # is entirely inside the valid visual window.  Computed as a strict
    # PREFIX so non-ascending index lists degrade gracefully to the fully
    # masked path instead of mis-skipping masks.
    cb = visual_len // block_n
    nb0 = indices.shape[-1]
    slot = jnp.arange(nb0, dtype=jnp.int32)
    dirty = (indices >= cb) | (slot >= counts[..., None])
    clean = jnp.sum(jnp.cumsum(dirty.astype(jnp.int32), axis=-1) == 0,
                    axis=-1).astype(jnp.int32)
    clean_f = clean.reshape(bh, nq, 1, 1)
    scale_ops = ()
    if kv_quant is not None:
        (indices, sk_rows, sv_rows), nb = _pad_slots(
            (indices, sk_rows, sv_rows), chunk_blocks)
        scale_ops = (sk_rows.astype(jnp.float32).reshape(bh, nq, 1, nb),
                     sv_rows.astype(jnp.float32).reshape(bh, nq, 1, nb))
    else:
        (indices,), nb = _pad_slots((indices,), chunk_blocks)
    idx_f = indices.reshape(bh, nq, 1, nb)

    kernel = functools.partial(
        _sparse_attn_kernel,
        block_n=block_n,
        chunk_blocks=chunk_blocks,
        sm_scale=sm_scale,
        visual_len=visual_len,
        text_start=text_start,
        return_stats=return_stats,
        quant=quant_mode,
        prefetch=prefetch_next,
    )

    tile_spec = pl.BlockSpec((1, block_m, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, block_m, 128), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bh, sq, d), q.dtype)
    if return_stats:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bh, sq, 128), jnp.float32),
                     jax.ShapeDtypeStruct((bh, sq, 128), jnp.float32))
        out_specs = (tile_spec, stat_spec, stat_spec)
    else:
        out_specs = tile_spec

    # the NEXT row's counts/indices for the epilogue prefetch (clamped at
    # the last row; the kernel guards j+1 < nq so the clamp is never used)
    nq_last = nq - 1
    next_map = lambda i, j: (i, jnp.minimum(j + 1, nq_last), 0, 0)
    prefetch_specs, prefetch_ops = [], []
    if prefetch_next:
        prefetch_specs = [
            pl.BlockSpec((1, 1, 1, 1), next_map,
                         memory_space=pltpu.SMEM),            # counts_next
            pl.BlockSpec((1, 1, 1, nb), next_map,
                         memory_space=pltpu.SMEM),            # idx_next
        ]
        prefetch_ops = [counts_f, idx_f]

    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),            # counts
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),            # clean prefix
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),            # text_len
            pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),            # indices
            *prefetch_specs,
            *([pl.BlockSpec((1, 1, 1, nb), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.SMEM)] * len(scale_ops)),
            pl.BlockSpec((1, block_m, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),            # q
            pl.BlockSpec(memory_space=pl.ANY),                # packed KV
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, chunk_blocks * block_n, 2 * d), kv_dtype),
            pltpu.SemaphoreType.DMA((2, chunk_blocks)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(counts_f, clean_f, tlen_f, idx_f, *prefetch_ops, *scale_ops, qf, kv)
    if return_stats:
        o, m, l = out
        return (o.reshape(b, h, sq, d),
                m[..., 0].reshape(b, h, sq),
                l[..., 0].reshape(b, h, sq))
    return out.reshape(b, h, sq, d)


def block_sparse_attention_reference(
    q: jax.Array,          # [B, H, Sq, D]
    k: jax.Array,          # [B, H, S,  D]
    v: jax.Array,          # [B, H, S,  D]
    block_mask: jax.Array, # [B, H, NQ, NB] bool
    kv_valid: jax.Array,   # [B, S] bool token-level key validity
    *,
    block_m: int = 128,
    block_n: int = 128,
    sm_scale: float | None = None,
) -> jax.Array:
    """O(S²) jnp oracle with identical semantics (materialises scores;
    small shapes / tests only — the reference's "vanilla" mode analogue,
    reference: attn.py:121-149)."""
    b, h, sq, d = q.shape
    s = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
    tok_mask = jnp.repeat(jnp.repeat(block_mask, block_m, axis=2),
                          block_n, axis=3)
    tok_mask = tok_mask & kv_valid[:, None, None, :]
    scores = jnp.where(tok_mask, scores, MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)

"""Rectified block-sparse attention — the public attention entry point.

Combines the jitted mask pipeline (sparse/), the Pallas gather kernel
(kernels/block_sparse.py) and the rectification math into the equivalent of
the reference's ``rectified_block_sparse_attention`` /
``block_sparse_attention_combined``
(reference: rectified_hunyuan_attn.py:283-417 for the joint flavor,
rectified_wan21_attn.py:276-386 for the visual-only flavor):

  1. visual-query rows run the dynamic block-sparse kernel and are
     rectified:  out = sparse_out * R + comp
  2. text-query rows (joint layout) get exact dense attention over all keys
  3. key/value positions outside the valid windows are zeroed before any
     pooling so pooled statistics match the reference's masked_fill
     (rectified_hunyuan_attn.py:306-308)

All shapes are static; per-prompt text length enters as a traced [B] int32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..sparse import SparseConfig, build_sparse_plan
from ..sparse.ops import group_rows
from ..kernels import (block_sparse_flash_attention,
                       block_sparse_flash_attention_grouped)


def kv_validity(batch: int, seq_len: int, visual_len: int,
                text_start: Optional[int], text_len_rt: Optional[jax.Array],
                text_len_max: int = 0) -> jax.Array:
    """[B, S] bool — True at attendable key positions for the padded
    [visual | visual-pad | text | text-pad] layout."""
    pos = jnp.arange(seq_len)[None, :]
    valid = pos < visual_len
    if text_start is not None:
        if text_len_rt is None:
            text_len_rt = jnp.full((batch,), text_len_max, jnp.int32)
        valid = valid | ((pos >= text_start) &
                         (pos < text_start + text_len_rt[:, None]))
    return jnp.broadcast_to(valid, (batch, seq_len))


def _head_chunked(q, k, v, cfg, neighbor_mask, *, visual_len, text_len_rt,
                  interpret, kv_packed, q_text, density_only):
    """Head-tiled execution of the full rectified site (SparseConfig.
    head_chunk): every stage is per-head independent, so running
    H/head_chunk tiles through a fori_loop divides all attention-path
    temporaries by the tile count at identical math (the loop body can
    fuse differently from the one-shot program, so outputs may move in
    the last fp32 ulp) — the
    peak-HBM lever for trees too large to leave full-head headroom
    (Wan2.1-I2V 16.4B at full depth).  The loop carry aliases the output
    buffer, so the only full-head allocation is the output itself."""
    import dataclasses
    b, h, s, d = q.shape
    hc = cfg.head_chunk
    if h % hc:
        raise ValueError(f"head_chunk ({hc}) must divide the head "
                         f"count ({h})")
    sub = dataclasses.replace(cfg, head_chunk=0)
    ntiles = h // hc

    def call(i):
        sl = lambda x: (None if x is None
                        else jax.lax.dynamic_slice_in_dim(x, i * hc, hc, 1))
        return rectified_sparse_attention(
            sl(q), sl(k), sl(v), sub, neighbor_mask,
            visual_len=visual_len, text_len_rt=text_len_rt,
            interpret=interpret, kv_packed=sl(kv_packed),
            q_text=sl(q_text), density_only=density_only)

    if density_only:
        # mean density over equal-size head tiles = the global mean
        acc = jax.lax.fori_loop(
            0, ntiles, lambda i, a: a + call(i), jnp.float32(0.0))
        return acc / ntiles
    out_s = s + cfg.text_len if q_text is not None else s
    out0 = jnp.zeros((b, h, out_s, d), q.dtype)
    body = lambda i, buf: jax.lax.dynamic_update_slice_in_dim(
        buf, call(i), i * hc, axis=1)
    return jax.lax.fori_loop(0, ntiles, body, out0)


def rectified_sparse_attention(
    q: jax.Array,                       # [B, H, S, D] (visual[+text], padded)
    k: jax.Array,
    v: jax.Array,
    cfg: SparseConfig,
    neighbor_mask: Optional[jax.Array] = None,   # [NB, NB] bool
    *,
    visual_len: int,                    # static true visual token count
    text_len_rt: Optional[jax.Array] = None,     # [B] int32 (joint layout)
    interpret: bool = False,
    kv_packed: Optional[jax.Array] = None,       # [B,H,S,2D] producer-packed
    q_text: Optional[jax.Array] = None,          # [B,H,text_len,D] split q
    density_only: bool = False,                  # return the plan's mean
                                                 # density scalar instead
) -> jax.Array:
    """Returns [B, H, S, D] attention output in q.dtype (padded rows are
    garbage and must be dropped by the caller, as in the reference).

    ``kv_packed``: the caller already holds KV packed as [..., K|V] (pack
    at producer).  The kernels then gather from it directly instead of
    materialising their own packed copy next to the unpacked k/v — at
    400k+ tokens that duplicate alone is ~5 GB (VERDICT r3 #4).  k/v must
    be the matching slices (``kv_packed[..., :d]`` / ``[..., d:]``):
    they only feed pooled statistics, which XLA fuses into reductions
    without materialising.  Kernel-side validity zeroing is unnecessary
    (the kernel window-masks every non-clean block's scores).

    ``q_text``: the caller already holds q split at the visual/text seam
    (joint layout) — ``q`` is then visual-only and the [B,H,Sv,D] slice
    copy the split would otherwise cost disappears (the visual prefix of
    an interior axis is not a bitcast)."""
    b, h, s, d = q.shape
    if cfg.head_chunk and 0 < cfg.head_chunk < h:
        return _head_chunked(q, k, v, cfg, neighbor_mask,
                             visual_len=visual_len, text_len_rt=text_len_rt,
                             interpret=interpret, kv_packed=kv_packed,
                             q_text=q_text, density_only=density_only)
    bm = cfg.block_m
    if q_text is not None:
        assert cfg.layout == "joint", "q_text is a joint-layout split"
        sv_true = s
        s = sv_true + cfg.text_len
    else:
        sv_true = s - cfg.text_len if cfg.layout == "joint" else s
    pad = (-sv_true) % bm
    # explicit raises (not asserts): these guard silently-wrong numerics
    # paths and must survive `python -O`
    if kv_packed is not None and pad != 0:
        raise ValueError("kv_packed requires a block-aligned visual region")
    if q_text is not None and pad != 0:
        raise ValueError("q_text requires a block-aligned visual region")
    if pad:
        # Pad the visual region to a block multiple with zero tokens
        # between visual and text (the reference pads inside the call,
        # rectified_wan21_attn.py:299-304 / rectified_cogvideo_attn.py:308).
        def ins(x):
            z = jnp.zeros((b, h, pad, d), x.dtype)
            return jnp.concatenate([x[:, :, :sv_true], z, x[:, :, sv_true:]],
                                   axis=2)
        q, k, v = ins(q), ins(k), ins(v)
        s += pad
    if cfg.layout == "joint":
        sv_pad = s - cfg.text_len
        text_start = sv_pad
    else:
        sv_pad = s
        text_start = None
    assert sv_pad % bm == 0, (sv_pad, bm)
    nq = sv_pad // bm

    if text_len_rt is None and cfg.layout == "joint":
        text_len_rt = jnp.full((b,), cfg.text_len, jnp.int32)
    tlen = (text_len_rt.astype(jnp.int32) if text_len_rt is not None
            else jnp.zeros((b,), jnp.int32))

    if kv_packed is None and cfg.kv_pack and cfg.kv_quant == "none":
        # cfg-driven producer pack (SparseConfig.kv_pack): concatenate
        # K|V here so XLA fuses the qkv/rope producers straight into the
        # packed [B,H,S,2D] buffer and the separate k/v DCE (the slices
        # below feed only pooled stats, which fuse into reductions) —
        # the kernel then gathers from the stream instead of
        # materialising its OWN packed copy (~1.5 GB at Wan 75.6k
        # tokens, ~5 GB at 400k).  Packing happens AFTER the pad insert,
        # so non-block-aligned visual regions compose (the explicit
        # kv_packed arg is the caller-packed-pre-pad path and keeps its
        # alignment requirement above).
        kv_packed = jnp.concatenate([k, v], axis=-1)
        k, v = kv_packed[..., :d], kv_packed[..., d:]
    valid = kv_validity(b, s, visual_len, text_start, tlen)
    if kv_packed is None:
        # Zero K/V outside the valid windows (feeds pooled stats + kernel).
        k = jnp.where(valid[:, None, :, None], k, 0)
        v = jnp.where(valid[:, None, :, None], v, 0)
    # With kv_packed the plan reads stats from the packed array directly
    # (validity-zeroed per tile inside the plan) and the kernel gathers
    # from it with window masking — the k/v args are then shape-only and
    # XLA DCEs them, so no full-length zeroed copies ever materialise.

    text_valid = None
    if cfg.layout == "joint":
        text_valid = (jnp.arange(cfg.text_len)[None, :] < tlen[:, None])

    q_vis = q if q_text is not None else q[:, :, :sv_pad, :]
    plan = build_sparse_plan(q_vis, k, v, cfg, neighbor_mask=neighbor_mask,
                             text_valid=text_valid, kv_packed=kv_packed,
                             kv_valid=valid if kv_packed is not None else None)
    if density_only:
        # EXECUTED mask density of this call's plan (mean selected key
        # blocks / NB_total) — the pipelines' density probe builds the
        # exact plan (same padding/validity/windows) and reads only this
        # scalar; everything else in the caller DCEs (VERDICT r4 weak #1:
        # the compiled program can't carry host callbacks on this
        # platform, so density is probed by a sibling program instead).
        return (jnp.mean(plan.counts.astype(jnp.float32))
                / plan.block_mask.shape[-1])

    if kv_packed is not None and cfg.kv_quant != "none":
        # validity zeroing of k/v is skipped under kv_packed, and the
        # quantized path pools from the raw k/v — un-zeroed K/V would be
        # silently wrong numerics, so fail loudly (survives python -O)
        raise ValueError("kv_packed does not compose with kv_quant")
    if cfg.group_rows > 1:
        # Grouped-row execution: G query blocks per program over the union
        # of their key sets — wins when adjacent curve blocks select
        # overlapping keys (the kernel is DMA-bound at one row/program).
        # Non-multiple NQ pads empty rows whose outputs are dropped.
        gr = cfg.group_rows
        row_pad = (-nq) % gr
        pmask = plan.block_mask
        q_kern = q_vis
        if row_pad:
            pmask = jnp.pad(pmask, ((0, 0), (0, 0), (0, row_pad), (0, 0)))
            q_kern = jnp.pad(q_vis,
                             ((0, 0), (0, 0), (0, row_pad * bm), (0, 0)))
        u_idx, u_counts, rowbits, u_clean = group_rows(
            pmask, gr, clean_blocks=visual_len // cfg.block_n)
        sparse_out = block_sparse_flash_attention_grouped(
            q_kern, k, v, u_idx, u_counts, rowbits, u_clean, tlen, group=gr,
            visual_len=visual_len, text_start=text_start,
            block_m=bm, block_n=cfg.block_n,
            chunk_blocks=cfg.kernel_chunk_blocks, interpret=interpret,
            packed_kv=kv_packed)
        if row_pad:
            sparse_out = sparse_out[:, :, :sv_pad]
    else:
        kv_quant = None
        if cfg.kv_quant != "none":
            from ..sparse.ops import quantize_kv_blocks
            kv_quant = quantize_kv_blocks(k, v, cfg.block_n)
        sparse_out = block_sparse_flash_attention(
            q_vis, k, v, plan.indices, plan.counts, tlen,
            visual_len=visual_len, text_start=text_start,
            block_m=bm, block_n=cfg.block_n,
            chunk_blocks=cfg.kernel_chunk_blocks, interpret=interpret,
            kv_quant=kv_quant,
            quant_mode=None if cfg.kv_quant == "none" else cfg.kv_quant,
            packed_kv=kv_packed)

    # Apply R/comp by broadcast at block granularity (the reference
    # repeat_interleaves to token level, rectified_hunyuan_attn.py:352,357
    # — a 128x larger intermediate for the same result).
    so_blocks = sparse_out.reshape(b, h, nq, bm, d)

    def _rectify(so_t, r_t, c_t):
        return (so_t.astype(jnp.float32) * r_t[..., None, None]
                + c_t[..., None, :]).astype(q.dtype)

    if cfg.plan_row_chunk and cfg.plan_row_chunk < nq:
        # Row-chunked rectification: XLA materialises the fp32 convert of
        # sparse_out AND the token-broadcast of comp as full-length
        # buffers (2 x 3.96G at 345k tokens — the largest allocations
        # after the plan-build levers); bound them with the same row
        # tiling as the plan (tail tile clamps + overlaps, elementwise
        # per row so the rewrite is identical).
        chunk = cfg.plan_row_chunk
        ntiles = -(-nq // chunk)

        def body(i, buf):
            # IN-PLACE: the carry IS the kernel-output buffer (sparse_out
            # is dead after the reshape, so the while-loop aliases it and
            # the fp32/bf16 work stays tile-sized).  A separate zeros
            # accumulator here was a full output-size HLO temp — 2.64 GB
            # at 461k tokens, the exact OOM margin of the 512-frame point.
            r0 = jnp.minimum(i * chunk, nq - chunk)
            sl = lambda x, ax: jax.lax.dynamic_slice_in_dim(x, r0, chunk, ax)
            so_t = sl(buf, 2)
            o_t = _rectify(so_t, sl(plan.r_factor, 2), sl(plan.comp, 2))
            # the clamped tail tile overlaps rows a previous tile already
            # rectified — keep the buffer's (rectified) value there
            done = (r0 + jnp.arange(chunk, dtype=jnp.int32)) < i * chunk
            o_t = jnp.where(done[None, None, :, None, None], so_t, o_t)
            return jax.lax.dynamic_update_slice_in_dim(buf, o_t, r0, axis=2)

        out_vis = jax.lax.fori_loop(0, ntiles, body, so_blocks)
    else:
        out_vis = _rectify(so_blocks, plan.r_factor, plan.comp)
    out_vis = out_vis.reshape(b, h, sv_pad, d)

    if cfg.layout == "joint":
        # Text-query rows: exact attention over ALL keys (reference:
        # rectified_hunyuan_attn.py:369-383).  Reuses the sparse kernel
        # with full index lists — same validity semantics, no separate
        # dense kernel program.
        nb_total = s // cfg.block_n
        nq_text = cfg.text_blocks
        full_idx = jnp.broadcast_to(
            jnp.arange(nb_total, dtype=jnp.int32),
            (b, h, nq_text, nb_total))
        full_counts = jnp.full((b, h, nq_text), nb_total, jnp.int32)
        qt = q_text if q_text is not None else q[:, :, sv_pad:, :]
        out_text = block_sparse_flash_attention(
            qt, k, v, full_idx, full_counts, tlen,
            visual_len=visual_len, text_start=text_start,
            block_m=bm, block_n=cfg.block_n, interpret=interpret,
            packed_kv=kv_packed)
        out = jnp.concatenate([out_vis, out_text.astype(q.dtype)], axis=2)
    else:
        out = out_vis
    if pad:
        out = jnp.concatenate([out[:, :, :sv_true], out[:, :, sv_pad:]],
                              axis=2)
    return out

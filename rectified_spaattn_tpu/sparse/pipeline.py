"""End-to-end sparse-plan construction: pooled scores → IPAR → GAPR →
top-p/top-k selection → force-includes → rectification factors.

One implementation, two layout flavors (SURVEY §2.1 "per-model algorithm
differences"):

  joint  — Hunyuan / Flux / CogVideoX: text tokens trail the visual tokens;
           visual queries are sparse over visual blocks + always see all
           text; IPAR renormalises pooled visual probabilities against
           un-pooled text probabilities
           (reference: rectified_hunyuan_attn.py:171-280).
  visual — Wan 2.1 / 2.2 self-attention: keys are visual-only, no IPAR,
           optional first-frame block retention
           (reference: rectified_wan21_attn.py:171-273).

Everything is jit-compatible with static shapes; variable text length is
handled with a validity mask instead of the reference's dynamic slices.

Every plan stage is row-separable (each query-block row only needs the
full COLUMN side), so the build optionally tiles over query-block rows
(``cfg.plan_row_chunk``): at 345k+ tokens the one-shot fp32
[B,H,NQ,NK] temporaries alone cost several GB, and tiling bounds them to
[B,H,chunk,NK] — the single-chip long-context enabler
(scripts/bench_longctx.py; VERDICT r3 next-round #4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import SparseConfig
from . import ops

NEG_INF = float(jnp.finfo(jnp.float32).min) * 0.5


class SparsePlan(NamedTuple):
    """Everything the sparse kernel + rectification need for one call.

    block_mask: [B,H,NQ,NB_total] bool — kernel-visible key-block mask
      (includes forced text columns for the joint layout).
    indices:    [B,H,NQ,NB_total] int32 — compacted column indices; the
      first ``counts`` entries are the selected blocks (ascending), the
      remainder repeat the last valid block.
    counts:     [B,H,NQ] int32 — number of selected key blocks per row.
    r_factor:   [B,H,NQ] fp32 — critical-token rectification scale R.
    comp:       [B,H,NQ,D] fp32 — non-critical pooled-value compensation
      (per query block; broadcast over the 128 tokens of the block).
    """

    block_mask: jax.Array
    indices: jax.Array
    counts: jax.Array
    r_factor: jax.Array
    comp: jax.Array


def _blockify(x: jax.Array, block: int) -> jax.Array:
    b, h, s, d = x.shape
    return x.reshape(b, h, s // block, block, d)


def _plan_rows(q_blocks, q_pool, row_ids, *, cfg, nq, k_pool_vis,
               k_vis_blocks, key_text, text_valid, neighbor_rows,
               value_pool, sm_scale):
    """Build the plan for one tile of query-block rows.

    q_blocks: [B,H,T,bm,D]; q_pool: [B,H,T,D]; row_ids: [T] int32 global
    row indices (may exceed nq-1 for pad rows — their outputs are
    dropped); neighbor_rows: [T, NB_vis] bool or None.  All column-side
    arrays are full-width and shared across tiles.
    """
    b, h = q_pool.shape[:2]
    t = q_pool.shape[2]

    if cfg.layout == "joint":
        k_cols = jnp.concatenate([k_pool_vis, key_text], axis=-2)
        scores_unscaled = ops.pooled_scores(q_pool, k_cols)  # [B,H,T,NQ+Tt]
        scores = scores_unscaled * sm_scale
        if text_valid is not None:
            tv = text_valid[:, None, None, :]                # [B,1,1,Tt]
            pad = jnp.concatenate(
                [jnp.ones((b, 1, 1, nq), bool),
                 jnp.broadcast_to(tv, (b, 1, 1, cfg.text_len))], axis=-1)
            scores = jnp.where(pad, scores, NEG_INF)
        probs_tok = jax.nn.softmax(scores, axis=-1)
        nogapr = ops.estimate_pr_gain(
            q_blocks, k_vis_blocks, q_pool, k_pool_vis,
            scores_unscaled[..., :nq])
        probs = ops.ipar_reallocate(probs_tok, nq, cfg.block_n)
    else:
        scores_unscaled = ops.pooled_scores(q_pool, k_pool_vis)
        probs = jax.nn.softmax(scores_unscaled * sm_scale, axis=-1)
        nogapr = ops.estimate_pr_gain(
            q_blocks, k_vis_blocks, q_pool, k_pool_vis, scores_unscaled)

    # Top-p with top-k floor over the (IPAR'd) probabilities.
    select = (ops.topp_threshold_onehot_bisect
              if cfg.topp_impl == "bisect" else ops.topp_threshold_onehot)
    onehot_sel = select(probs, cfg.p_remain, cfg.top_k_floor)

    vis_cols = onehot_sel[..., :nq] if cfg.layout == "joint" else onehot_sel
    if neighbor_rows is not None:
        vis_cols = vis_cols | neighbor_rows[None, None, :, :vis_cols.shape[-1]]
    if cfg.first_frame_blocks > 0:
        vis_cols = vis_cols | ops.ff_force_mask(
            row_ids, vis_cols.shape[-1], cfg.first_frame_blocks)[None, None]
    if cfg.layout == "joint":
        text_cols = jnp.ones((b, h, t, cfg.text_blocks), bool)
        block_mask = jnp.concatenate([vis_cols, text_cols], axis=-1)
    else:
        block_mask = vis_cols

    # Partial (critical) set for rectification: executed visual blocks ∪
    # GAPR-untrusted blocks; the aggregated-text column is always critical
    # (its kernel blocks are force-included).
    if cfg.layout == "joint":
        partial = jnp.concatenate(
            [vis_cols | nogapr, jnp.ones((b, h, t, 1), bool)], axis=-1)
    else:
        partial = block_mask | nogapr

    r_factor, comp = ops.rectification(probs, partial, value_pool)
    indices, counts = ops.mask_to_indices(block_mask)
    return block_mask, indices, counts, r_factor, comp


def build_sparse_plan(
    query: jax.Array,            # [B,H,Sv,D] visual queries (Sv % block == 0)
    key: jax.Array,              # [B,H,S,D] keys (zeroed at invalid positions)
    value: jax.Array,            # [B,H,S,D] values (zeroed at invalid positions)
    cfg: SparseConfig,
    neighbor_mask: Optional[jax.Array] = None,   # [NB,NB] bool (visual blocks)
    text_valid: Optional[jax.Array] = None,      # [B,text_len] bool (joint)
) -> SparsePlan:
    """Build the dynamic block mask and rectification terms for one call."""
    b, h, sv, d = query.shape
    bm, bn = cfg.block_m, cfg.block_n
    nq = sv // bm
    sm_scale = d ** -0.5

    q_blocks = _blockify(query, bm)                       # [B,H,NQ,bm,D]
    q_pool = jnp.mean(q_blocks.astype(jnp.float32), axis=-2)
    k_vis_blocks = _blockify(key[:, :, :nq * bn, :], bn)  # [B,H,NQ,bn,D]
    k_pool_vis = jnp.mean(k_vis_blocks.astype(jnp.float32), axis=-2)

    key_text = None
    if cfg.layout == "joint":
        key_text = key[:, :, nq * bn: nq * bn + cfg.text_len, :].astype(
            jnp.float32)
        value_pool = ops.block_pool(value, bn)[:, :, :nq + 1, :]
    else:
        nb_vis = key.shape[2] // bn
        k_vis_blocks = _blockify(key, bn)
        if nb_vis > nq:  # cross-shaped grids never occur; keep parity anyway
            k_pool_vis = ops.block_pool(key, bn)
        value_pool = ops.block_pool(value, bn)

    shared = dict(cfg=cfg, nq=nq, k_pool_vis=k_pool_vis,
                  k_vis_blocks=k_vis_blocks, key_text=key_text,
                  text_valid=text_valid, value_pool=value_pool,
                  sm_scale=sm_scale)

    chunk = cfg.plan_row_chunk
    if not chunk or chunk >= nq:
        nb_rows = (neighbor_mask[:nq] if neighbor_mask is not None
                   else None)
        block_mask, indices, counts, r_factor, comp = _plan_rows(
            q_blocks, q_pool, jnp.arange(nq, dtype=jnp.int32),
            neighbor_rows=nb_rows, **shared)
        nb_total = key.shape[2] // bn
        assert block_mask.shape[-1] == nb_total, (block_mask.shape, nb_total)
        return SparsePlan(block_mask, indices, counts, r_factor, comp)

    # ---- row-chunked build: bound the fp32 [B,H,*,NK] temps ----
    pad_rows = (-nq) % chunk
    nq_pad = nq + pad_rows
    ntiles = nq_pad // chunk
    if pad_rows:
        q_blocks = jnp.pad(q_blocks,
                           ((0, 0), (0, 0), (0, pad_rows), (0, 0), (0, 0)))
        q_pool = jnp.pad(q_pool, ((0, 0), (0, 0), (0, pad_rows), (0, 0)))
    nb_mask = (neighbor_mask[:nq] if neighbor_mask is not None else None)
    if nb_mask is not None and pad_rows:
        nb_mask = jnp.pad(nb_mask, ((0, pad_rows), (0, 0)))

    nb_total = key.shape[2] // bn
    out0 = (jnp.zeros((b, h, nq_pad, nb_total), bool),
            jnp.zeros((b, h, nq_pad, nb_total), jnp.int32),
            jnp.zeros((b, h, nq_pad), jnp.int32),
            jnp.zeros((b, h, nq_pad), jnp.float32),
            jnp.zeros((b, h, nq_pad, d), jnp.float32))

    def tile(i, outs):
        r0 = i * chunk
        qb_t = jax.lax.dynamic_slice_in_dim(q_blocks, r0, chunk, axis=2)
        qp_t = jax.lax.dynamic_slice_in_dim(q_pool, r0, chunk, axis=2)
        row_ids = r0 + jnp.arange(chunk, dtype=jnp.int32)
        nb_rows = (jax.lax.dynamic_slice_in_dim(nb_mask, r0, chunk, axis=0)
                   if nb_mask is not None else None)
        parts = _plan_rows(qb_t, qp_t, row_ids, neighbor_rows=nb_rows,
                           **shared)
        return tuple(
            jax.lax.dynamic_update_slice_in_dim(o, p, r0, axis=2)
            for o, p in zip(outs, parts))

    outs = jax.lax.fori_loop(0, ntiles, tile, out0)
    block_mask, indices, counts, r_factor, comp = (
        o[:, :, :nq] for o in outs)
    return SparsePlan(block_mask, indices, counts, r_factor, comp)

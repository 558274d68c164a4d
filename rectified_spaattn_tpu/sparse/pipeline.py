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

    if cfg.layout == "joint":
        # Pooled visual blocks + un-pooled text tokens as score columns.
        key_text = key[:, :, nq * bn: nq * bn + cfg.text_len, :].astype(jnp.float32)
        k_cols = jnp.concatenate([k_pool_vis, key_text], axis=-2)
        scores_unscaled = ops.pooled_scores(q_pool, k_cols)   # [B,H,NQ,NQ+Tt]
        scores = scores_unscaled * sm_scale
        if text_valid is not None:
            tv = text_valid[:, None, None, :]                  # [B,1,1,Tt]
            pad = jnp.concatenate(
                [jnp.ones((b, 1, 1, nq), bool),
                 jnp.broadcast_to(tv, (b, 1, 1, cfg.text_len))], axis=-1)
            scores = jnp.where(pad, scores, NEG_INF)
        probs_tok = jax.nn.softmax(scores, axis=-1)
        nogapr = ops.estimate_pr_gain(
            q_blocks, k_vis_blocks, q_pool, k_pool_vis,
            scores_unscaled[..., :nq])
        probs = ops.ipar_reallocate(probs_tok, nq, bn)         # [B,H,NQ,NQ+1]
    else:
        nb_vis = key.shape[2] // bn
        if nb_vis > nq:  # cross-shaped grids never occur; keep parity anyway
            k_pool_vis = ops.block_pool(key, bn)
        scores_unscaled = ops.pooled_scores(q_pool, k_pool_vis)  # [B,H,NQ,NB]
        probs = jax.nn.softmax(scores_unscaled * sm_scale, axis=-1)
        nogapr = ops.estimate_pr_gain(
            q_blocks, _blockify(key, bn), q_pool, k_pool_vis, scores_unscaled)

    # Top-p with top-k floor over the (IPAR'd) probabilities.
    select = (ops.topp_threshold_onehot_bisect
              if cfg.topp_impl == "bisect" else ops.topp_threshold_onehot)
    onehot_sel = select(probs, cfg.p_remain, cfg.top_k_floor)

    # Assemble the kernel-visible mask over all key blocks.
    nb_total = key.shape[2] // bn
    vis_cols = onehot_sel[..., :nq] if cfg.layout == "joint" else onehot_sel
    if neighbor_mask is not None:
        vis_cols = vis_cols | neighbor_mask[None, None, :nq, :vis_cols.shape[-1]]
    if cfg.first_frame_blocks > 0:
        vis_cols = vis_cols | ops.ff_force_mask(
            jnp.arange(nq), vis_cols.shape[-1],
            cfg.first_frame_blocks)[None, None]
    if cfg.layout == "joint":
        text_cols = jnp.ones((b, h, nq, cfg.text_blocks), bool)
        block_mask = jnp.concatenate([vis_cols, text_cols], axis=-1)
    else:
        block_mask = vis_cols
    assert block_mask.shape[-1] == nb_total, (block_mask.shape, nb_total)

    # Partial (critical) set for rectification: executed visual blocks ∪
    # GAPR-untrusted blocks; the aggregated-text column is always critical
    # (its kernel blocks are force-included).
    if cfg.layout == "joint":
        partial = jnp.concatenate(
            [vis_cols | nogapr, jnp.ones((b, h, nq, 1), bool)], axis=-1)
        value_pool = ops.block_pool(value, bn)[:, :, :nq + 1, :]
    else:
        partial = block_mask | nogapr
        value_pool = ops.block_pool(value, bn)

    r_factor, comp = ops.rectification(probs, partial, value_pool)
    indices, counts = ops.mask_to_indices(block_mask)
    return SparsePlan(block_mask, indices, counts, r_factor, comp)

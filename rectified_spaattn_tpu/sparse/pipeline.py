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


def _plan_rows(q_blocks, row_ids, *, cfg, nq, k_pool_vis,
               dk_vis, key_text, text_valid, neighbor_rows,
               value_pool, sm_scale):
    """Build the plan for one tile of query-block rows.

    q_blocks: [B,H,T,bm,D]; row_ids: [T] int32 global row indices;
    neighbor_rows: [T, NB_vis] bool or None.  All column-side arrays
    (``k_pool_vis``/``dk_vis``/``key_text``/``value_pool``, fp32) are
    full-width per-key-block statistics shared across tiles — see
    ``_column_stats``.
    """
    b, h = q_blocks.shape[:2]
    t = q_blocks.shape[2]
    q_pool = jnp.mean(q_blocks.astype(jnp.float32), axis=-2)  # [B,H,T,D]

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
        nogapr = ops.gapr_from_stats(
            q_blocks, q_pool, k_pool_vis, dk_vis,
            scores_unscaled[..., :nq], jk=cfg.block_n)
        probs = ops.ipar_reallocate(probs_tok, nq, cfg.block_n)
    else:
        scores_unscaled = ops.pooled_scores(q_pool, k_pool_vis)
        probs = jax.nn.softmax(scores_unscaled * sm_scale, axis=-1)
        nogapr = ops.gapr_from_stats(
            q_blocks, q_pool, k_pool_vis, dk_vis, scores_unscaled,
            jk=cfg.block_n)

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


def _column_stats(key, value, cfg, nq, d, *, kv_packed=None, kv_valid=None):
    """Per-key-block fp32 statistics shared by every query row:
    pooled keys, GAPR key deviations, raw text keys, pooled values.

    Sources: either unpacked ``key``/``value`` (already zeroed at invalid
    positions by the caller) or producer-packed ``kv_packed`` [B,H,S,2D]
    with ``kv_valid`` [B,S] applied per tile — the packed source never
    materialises full-length K/V slices.

    ``cfg.plan_kv_tile`` > 0 computes the stats in tiles of that many key
    blocks (fori_loop with clamped overlapping tail), bounding the fp32
    block-view temporaries to [B,H,tile,bn,D] — together with
    ``plan_row_chunk`` this is what caps the plan build's peak HBM at
    345k+ tokens (the one-shot fp32 converts of full-length K/V were the
    three largest allocations in the 345k OOM dump).
    """
    bn = cfg.block_n
    s_total = (kv_packed if kv_packed is not None else key).shape[2]
    nb_total = s_total // bn
    nkv = nq if cfg.layout == "joint" else nb_total     # k-stat blocks
    npool = min(nq + 1, nb_total) if cfg.layout == "joint" else nb_total
    b, h = (kv_packed if kv_packed is not None else key).shape[:2]

    def tok(which, t0, ntok):
        """[B,H,ntok,D] token slice of K or V, validity-zeroed."""
        if kv_packed is not None:
            tile = jax.lax.dynamic_slice_in_dim(kv_packed, t0, ntok, axis=2)
            t = tile[..., :d] if which == "k" else tile[..., d:]
            if kv_valid is not None:
                vv = jax.lax.dynamic_slice_in_dim(kv_valid, t0, ntok, axis=1)
                t = jnp.where(vv[:, None, :, None], t, 0)
            return t
        src = key if which == "k" else value
        return jax.lax.dynamic_slice_in_dim(src, t0, ntok, axis=2)

    def k_stats(t0, nblk):
        kb = tok("k", t0 * bn, nblk * bn).reshape(
            b, h, nblk, bn, d).astype(jnp.float32)
        kp = jnp.mean(kb, axis=-2)
        return kp, ops.block_abs_dev(kb, kp)

    def v_pool(t0, nblk):
        vb = tok("v", t0 * bn, nblk * bn).reshape(
            b, h, nblk, bn, d).astype(jnp.float32)
        return jnp.mean(vb, axis=-2)

    tile = cfg.plan_kv_tile
    if not tile or tile >= nkv:
        k_pool_vis, dk_vis = k_stats(0, nkv)
    else:
        ntiles = -(-nkv // tile)

        def body(i, carry):
            kp, dk = carry
            r0 = jnp.minimum(i * tile, nkv - tile)   # tail overlaps: the
            kp_t, dk_t = k_stats(r0, tile)           # recompute is identical
            return (jax.lax.dynamic_update_slice_in_dim(kp, kp_t, r0, axis=2),
                    jax.lax.dynamic_update_slice_in_dim(dk, dk_t, r0, axis=2))

        k_pool_vis, dk_vis = jax.lax.fori_loop(
            0, ntiles, body,
            (jnp.zeros((b, h, nkv, d), jnp.float32),
             jnp.zeros((b, h, nkv, d), jnp.float32)))

    if not tile or tile >= npool:
        value_pool = v_pool(0, npool)
    else:
        ntiles = -(-npool // tile)

        def vbody(i, vp):
            r0 = jnp.minimum(i * tile, npool - tile)
            return jax.lax.dynamic_update_slice_in_dim(
                vp, v_pool(r0, tile), r0, axis=2)

        value_pool = jax.lax.fori_loop(
            0, ntiles, vbody, jnp.zeros((b, h, npool, d), jnp.float32))

    key_text = None
    if cfg.layout == "joint":
        key_text = tok("k", nq * bn, cfg.text_len).astype(jnp.float32)
    return k_pool_vis, dk_vis, key_text, value_pool, nb_total


def build_sparse_plan(
    query: jax.Array,            # [B,H,Sv,D] visual queries (Sv % block == 0)
    key: Optional[jax.Array],    # [B,H,S,D] keys (zeroed at invalid positions)
    value: Optional[jax.Array],  # [B,H,S,D] values (zeroed at invalid positions)
    cfg: SparseConfig,
    neighbor_mask: Optional[jax.Array] = None,   # [NB,NB] bool (visual blocks)
    text_valid: Optional[jax.Array] = None,      # [B,text_len] bool (joint)
    *,
    kv_packed: Optional[jax.Array] = None,       # [B,H,S,2D] packed [K|V]
    kv_valid: Optional[jax.Array] = None,        # [B,S] bool (packed source)
) -> SparsePlan:
    """Build the dynamic block mask and rectification terms for one call.

    With ``kv_packed``, ``key``/``value`` may be None (or dead slices of
    the packed array — XLA DCEs them): all key/value statistics are read
    from the packed array, validity-zeroed per tile via ``kv_valid``.
    """
    b, h, sv, d = query.shape
    bm, bn = cfg.block_m, cfg.block_n
    nq = sv // bm
    sm_scale = d ** -0.5

    q_blocks = _blockify(query, bm)                       # [B,H,NQ,bm,D]
    k_pool_vis, dk_vis, key_text, value_pool, nb_total = _column_stats(
        key, value, cfg, nq, d, kv_packed=kv_packed, kv_valid=kv_valid)

    shared = dict(cfg=cfg, nq=nq, k_pool_vis=k_pool_vis,
                  dk_vis=dk_vis, key_text=key_text,
                  text_valid=text_valid, value_pool=value_pool,
                  sm_scale=sm_scale)

    chunk = cfg.plan_row_chunk
    if not chunk or chunk >= nq:
        nb_rows = (neighbor_mask[:nq] if neighbor_mask is not None
                   else None)
        block_mask, indices, counts, r_factor, comp = _plan_rows(
            q_blocks, jnp.arange(nq, dtype=jnp.int32),
            neighbor_rows=nb_rows, **shared)
        assert block_mask.shape[-1] == nb_total, (block_mask.shape, nb_total)
        return SparsePlan(block_mask, indices, counts, r_factor, comp)

    # ---- row-chunked build: bound the fp32 [B,H,*,NK] temps.  The tail
    # tile starts at nq-chunk (clamped), overlapping the previous tile:
    # every plan stage is row-separable and deterministic, so the
    # overlapped rows are rewritten with identical values — no pad copies
    # of q_blocks and no trailing output slice. ----
    ntiles = -(-nq // chunk)
    nb_mask = (neighbor_mask[:nq] if neighbor_mask is not None else None)

    out0 = (jnp.zeros((b, h, nq, nb_total), bool),
            jnp.zeros((b, h, nq, nb_total), jnp.int32),
            jnp.zeros((b, h, nq), jnp.int32),
            jnp.zeros((b, h, nq), jnp.float32),
            jnp.zeros((b, h, nq, d), jnp.float32))

    def tile(i, outs):
        r0 = jnp.minimum(i * chunk, nq - chunk)
        qb_t = jax.lax.dynamic_slice_in_dim(q_blocks, r0, chunk, axis=2)
        row_ids = r0 + jnp.arange(chunk, dtype=jnp.int32)
        nb_rows = (jax.lax.dynamic_slice_in_dim(nb_mask, r0, chunk, axis=0)
                   if nb_mask is not None else None)
        parts = _plan_rows(qb_t, row_ids, neighbor_rows=nb_rows, **shared)
        return tuple(
            jax.lax.dynamic_update_slice_in_dim(o, p, r0, axis=2)
            for o, p in zip(outs, parts))

    outs = jax.lax.fori_loop(0, ntiles, tile, out0)
    return SparsePlan(*outs)

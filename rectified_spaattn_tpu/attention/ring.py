"""Ring sequence-parallel rectified sparse attention.

Scales the visual sequence BEYOND one chip's memory/compute: tokens are
sharded over the mesh's sp axis; pooled per-block statistics (K/V means
and GAPR deltas — NB×D per head, tiny) are all-gathered so every shard
builds the exact global block mask for its local query rows; then KV
shards rotate around the ring (jax.lax.ppermute over ICI) and each shard
executes only ITS selected blocks out of whichever shard is resident,
merging partial online-softmax results exactly (m/l correction).

This is a capability the reference does not have — its entire long-
sequence story is single-device block sparsity (SURVEY §5) — and it
composes with that sparsity: per ring step each chip does
density × (1/n) of dense work, and communication is the standard ring
KV rotation, overlapped by XLA with the kernel work.

Layouts:
  * "visual" (Wan-style self-attention): the sequence must be pre-padded
    so S == visual_len and S/n is a multiple of the block size.
  * "joint" (Hunyuan / Flux / CogVideoX trailing text): visual tokens are
    sharded over the ring; the text tail (tiny, ≤512 tokens) is
    REPLICATED on every shard.  Visual-query rows run the ring over
    visual KV shards plus ONE local text pass (text blocks are
    force-included, so no mask plan is needed for them); text-query rows
    run exact attention by ring-merging full-list passes over every
    visual shard plus a local text-text pass.  IPAR reallocation and the
    GAPR/rectification terms are computed per shard from the all-gathered
    pooled statistics plus the resident text keys — bit-comparable to the
    single-device joint plan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..sparse import SparseConfig
from ..sparse import ops
from ..kernels import block_sparse_flash_attention

NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _merge(o, m, l, o_p, m_p, l_p):
    """Exact merge of two normalised partial attentions over disjoint key
    sets (online-softmax cross-shard correction; guide §15 pattern)."""
    m_new = jnp.maximum(m, m_p)
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    a_old = jnp.where(l > 0, jnp.exp(m - m_safe), 0.0)
    a_new = jnp.where(l_p > 0, jnp.exp(m_p - m_safe), 0.0)
    l_new = a_old * l + a_new * l_p
    w_old = (a_old * l)[..., None]
    w_new = (a_new * l_p)[..., None]
    denom = jnp.where(l_new > 0, l_new, 1.0)[..., None]
    o_new = (o.astype(jnp.float32) * w_old
             + o_p.astype(jnp.float32) * w_new) / denom
    return o_new, m_new, l_new


def _row_tiled(plan_tile, nq_l: int, chunk: int, out0):
    """Run a row-separable plan tile over all local query rows, optionally
    as a fori_loop over ``chunk``-row tiles (the ring-side analogue of
    SparseConfig.plan_row_chunk: bounds the fp32 [B,H,rows,NB] plan temps
    when the PER-SHARD sequence is itself at the HBM ceiling).  The tail
    tile clamps + overlaps exactly like sparse/pipeline.py's chunked
    build (every stage is row-separable and deterministic)."""
    if not chunk or chunk >= nq_l:
        return plan_tile(jnp.int32(0), nq_l)
    ntiles = -(-nq_l // chunk)

    def body(i, outs):
        r0 = jnp.minimum(i * chunk, nq_l - chunk)
        parts = plan_tile(r0, chunk)
        return tuple(
            jax.lax.dynamic_update_slice_in_dim(o, p, r0, axis=2)
            for o, p in zip(outs, parts))

    return jax.lax.fori_loop(0, ntiles, body, out0)


def ring_rectified_sparse_attention(
    mesh: Mesh,
    q: jax.Array,            # [B, H, S, D] global (S == visual_len)
    k: jax.Array,
    v: jax.Array,
    cfg: SparseConfig,
    neighbor_mask: Optional[jax.Array] = None,   # [NB, NB] bool, global
    *,
    seq_axis: str = "sp",
    interpret: bool = False,
    q_text: Optional[jax.Array] = None,   # [B, H, T, D] replicated (joint)
    k_text: Optional[jax.Array] = None,
    v_text: Optional[jax.Array] = None,
    text_len_rt: Optional[jax.Array] = None,      # [B] int32
    kv_packed: Optional[jax.Array] = None,        # [B, H, S, 2D] global
):
    """Visual layout: returns [B, H, S, D], sharded over seq_axis.

    Joint layout (q_text/k_text/v_text given, cfg.layout == "joint"):
    returns (out_visual [B,H,S,D] sharded, out_text [B,H,T,D] replicated).

    Long-context levers compose (VERDICT r4 #8):
      * ``cfg.plan_row_chunk`` row-tiles each shard's plan build;
      * ``kv_packed`` rotates ONE producer-packed [K|V] buffer around the
        ring (half the ppermute count) and the kernel gathers from it
        directly; ``k``/``v`` must be the matching slices (shape-only
        under jit, like the single-device path).
    """
    if cfg.layout == "joint":
        assert q_text is not None and k_text is not None \
            and v_text is not None, "joint ring needs the text tail"
        return _ring_joint(mesh, q, k, v, cfg, neighbor_mask,
                           q_text, k_text, v_text, text_len_rt,
                           seq_axis=seq_axis, interpret=interpret,
                           kv_packed=kv_packed)
    n = mesh.shape[seq_axis]
    b, h, s, d = q.shape
    bn = cfg.block_n
    assert s % (n * cfg.block_m) == 0, (s, n, cfg.block_m)
    s_l = s // n
    nb_l = s_l // bn
    nb = nb_l * n

    if neighbor_mask is None:
        neighbor_mask = jnp.zeros((nb, nb), bool)

    def local(qs, nbm, *kv_args):
        me = jax.lax.axis_index(seq_axis)
        if kv_packed is not None:
            kvs, = kv_args
            ks, vs = kvs[..., :d], kvs[..., d:]
        else:
            ks, vs = kv_args
        # ---- global pooled stats from tiny all-gathers ----
        kp_l = ops.block_pool(ks, bn)                       # [B,H,NBl,D]
        vp_l = ops.block_pool(vs, bn)
        kb_l = ks.reshape(b, h, nb_l, bn, d)
        dk_l = jnp.mean(jnp.abs(kb_l.astype(jnp.float32)
                                - kp_l[..., None, :]), axis=-2)
        kp = jax.lax.all_gather(kp_l, seq_axis, axis=2, tiled=True)
        vp = jax.lax.all_gather(vp_l, seq_axis, axis=2, tiled=True)
        dk = jax.lax.all_gather(dk_l, seq_axis, axis=2, tiled=True)

        # ---- global-mask plan for the local query rows (row-tiled under
        # cfg.plan_row_chunk) ----
        qb_all = qs.reshape(b, h, nb_l, cfg.block_m, d)

        def plan_tile(r0, rows):
            qb = jax.lax.dynamic_slice_in_dim(qb_all, r0, rows, axis=2)
            qp = jnp.mean(qb.astype(jnp.float32), axis=-2)
            scores_u = ops.pooled_scores(qp, kp)            # [B,H,rows,NB]
            probs = jax.nn.softmax(scores_u * (d ** -0.5), axis=-1)
            iq, jk = cfg.block_m, bn
            dq = jnp.mean(jnp.abs(qb.astype(jnp.float32)
                                  - qp[..., None, :]), axis=-2)
            err = (jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", dq, kp)) * iq * jk
                   + jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", qp, dk))
                   * iq * jk)
            nogapr = ~((iq * jk) * jnp.abs(scores_u) > err)

            onehot = ops.topp_threshold_onehot(probs, cfg.p_remain,
                                               cfg.top_k_floor)
            row_ids = me * nb_l + r0 + jnp.arange(rows)
            nb_rows = jax.lax.dynamic_slice(
                nbm, (me * nb_l + r0, 0), (rows, nb))       # my rows
            mask = onehot | nb_rows[None, None]
            if cfg.first_frame_blocks > 0:
                mask = mask | ops.ff_force_mask(
                    row_ids, nb, cfg.first_frame_blocks)[None, None]

            partial = mask | nogapr
            r_factor = jnp.sum(jnp.where(partial, probs, 0.0), axis=-1)
            comp = jnp.einsum("bhqk,bhkd->bhqd",
                              jnp.where(partial, 0.0, probs), vp,
                              preferred_element_type=jnp.float32)
            return mask, r_factor, comp

        out0 = (jnp.zeros((b, h, nb_l, nb), bool),
                jnp.zeros((b, h, nb_l), jnp.float32),
                jnp.zeros((b, h, nb_l, d), jnp.float32))
        mask, r_factor, comp = _row_tiled(
            plan_tile, nb_l, cfg.plan_row_chunk, out0)

        # ---- ring execution over KV shards ----
        tlen0 = jnp.zeros((b,), jnp.int32)
        o = jnp.zeros((b, h, s_l, d), jnp.float32)
        m = jnp.full((b, h, s_l), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, h, s_l), jnp.float32)
        kvb = kv_args[0] if kv_packed is not None else None
        kb, vb = ks, vs
        for step in range(n):
            src = (me - step) % n          # owner of the resident shard
            sub = jax.lax.dynamic_slice(
                mask, (0, 0, 0, src * nb_l), (b, h, nb_l, nb_l))
            idx, cnt = ops.mask_to_indices(sub)
            if kv_packed is not None:
                kb, vb = kvb[..., :d], kvb[..., d:]
            o_p, m_p, l_p = block_sparse_flash_attention(
                qs, kb, vb, idx, cnt, tlen0, visual_len=s_l,
                text_start=None, block_m=cfg.block_m, block_n=bn,
                interpret=interpret, return_stats=True,
                packed_kv=kvb)
            # shift partial max by nothing — scores are translation-free
            # across shards (same scale), so m/l merge directly
            o, m, l = _merge(o, m, l, o_p, m_p, l_p)
            if step < n - 1:
                perm = [(i, (i + 1) % n) for i in range(n)]
                if kv_packed is not None:
                    # ONE rotation of the packed buffer instead of two
                    kvb = jax.lax.ppermute(kvb, seq_axis, perm)
                else:
                    kb = jax.lax.ppermute(kb, seq_axis, perm)
                    vb = jax.lax.ppermute(vb, seq_axis, perm)

        out = o * r_factor.repeat(cfg.block_m, axis=-1)[..., None] + \
            comp.repeat(cfg.block_m, axis=-2)
        return out.astype(qs.dtype)

    spec = P(None, None, seq_axis, None)
    kv_in = (spec,) if kv_packed is not None else (spec, spec)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, P(None, None)) + kv_in,
                   out_specs=spec, check_vma=False)
    if kv_packed is not None:
        return fn(q, neighbor_mask, kv_packed)
    return fn(q, neighbor_mask, k, v)


def _ring_joint(mesh, q, k, v, cfg, neighbor_mask, q_text, k_text, v_text,
                text_len_rt, *, seq_axis="sp", interpret=False,
                kv_packed=None):
    """Joint-layout ring: visual sharded, text replicated (see module
    docstring).  Mirrors the single-device joint plan
    (sparse/pipeline.py joint branch) per shard: pooled visual columns +
    un-pooled text columns → softmax → GAPR → IPAR → top-p/top-k over
    [NB+1] → rectification; text blocks execute via a local pass.
    cfg.plan_row_chunk row-tiles the per-shard plan; ``kv_packed``
    rotates one packed visual-KV buffer (text KV stays replicated and
    unpacked)."""
    n = mesh.shape[seq_axis]
    b, h, s, d = q.shape
    bn = cfg.block_n
    t = q_text.shape[2]
    assert s % (n * cfg.block_m) == 0, (s, n, cfg.block_m)
    assert t % bn == 0 and t == cfg.text_len, (t, cfg.text_len)
    s_l = s // n
    nb_l = s_l // bn
    nb = nb_l * n
    tb = t // bn
    sm_scale = d ** -0.5
    if text_len_rt is None:
        text_len_rt = jnp.full((b,), t, jnp.int32)
    if neighbor_mask is None:
        neighbor_mask = jnp.zeros((nb, nb), bool)

    def local(qs, nbm, qt, kt, vt, tlen, *kv_args):
        me = jax.lax.axis_index(seq_axis)
        if kv_packed is not None:
            kvs, = kv_args
            ks, vs = kvs[..., :d], kvs[..., d:]
        else:
            ks, vs = kv_args
        # zero invalid text keys before any pooling/scoring (mirrors
        # rectified.py::kv_validity + the reference's masked_fill,
        # rectified_hunyuan_attn.py:306-308)
        tvalid = jnp.arange(t)[None, :] < tlen[:, None]       # [B, T]
        kt = jnp.where(tvalid[:, None, :, None], kt, 0)
        vt = jnp.where(tvalid[:, None, :, None], vt, 0)

        # ---- global pooled visual stats from tiny all-gathers ----
        kp_l = ops.block_pool(ks, bn)
        vp_l = ops.block_pool(vs, bn)
        kb_l = ks.reshape(b, h, nb_l, bn, d)
        dk_l = jnp.mean(jnp.abs(kb_l.astype(jnp.float32)
                                - kp_l[..., None, :]), axis=-2)
        kp = jax.lax.all_gather(kp_l, seq_axis, axis=2, tiled=True)
        vp = jax.lax.all_gather(vp_l, seq_axis, axis=2, tiled=True)
        dk = jax.lax.all_gather(dk_l, seq_axis, axis=2, tiled=True)

        # ---- joint plan for the local query rows (row-tiled under
        # cfg.plan_row_chunk) ----
        qb_all = qs.reshape(b, h, nb_l, cfg.block_m, d)
        ktf = kt.astype(jnp.float32)

        def plan_tile(r0, rows):
            qb = jax.lax.dynamic_slice_in_dim(qb_all, r0, rows, axis=2)
            qp = jnp.mean(qb.astype(jnp.float32), axis=-2)
            scores_vis = ops.pooled_scores(qp, kp)         # [B,H,rows,NB]
            scores_txt = jnp.einsum("bhqd,bhkd->bhqk", qp, ktf)
            scores = jnp.concatenate([scores_vis, scores_txt],
                                     -1) * sm_scale
            pad = jnp.concatenate(
                [jnp.ones((b, 1, 1, nb), bool),
                 jnp.broadcast_to(tvalid[:, None, None, :],
                                  (b, 1, 1, t))], axis=-1)
            scores = jnp.where(pad, scores, NEG_BIG)
            probs_tok = jax.nn.softmax(scores, axis=-1)

            iq, jk = cfg.block_m, bn
            dq = jnp.mean(jnp.abs(qb.astype(jnp.float32)
                                  - qp[..., None, :]), axis=-2)
            err = (jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", dq, kp)) * iq * jk
                   + jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", qp, dk))
                   * iq * jk)
            nogapr = ~((iq * jk) * jnp.abs(scores_vis) > err)

            probs = ops.ipar_reallocate(probs_tok, nb, bn)   # [.., NB+1]
            onehot = ops.topp_threshold_onehot(probs, cfg.p_remain,
                                               cfg.top_k_floor)
            vis_cols = onehot[..., :nb]
            nb_rows = jax.lax.dynamic_slice(
                nbm, (me * nb_l + r0, 0), (rows, nb))
            vis_cols = vis_cols | nb_rows[None, None]
            if cfg.first_frame_blocks > 0:
                vis_cols = vis_cols | ops.ff_force_mask(
                    me * nb_l + r0 + jnp.arange(rows), nb,
                    cfg.first_frame_blocks)[None, None]

            partial = jnp.concatenate(
                [vis_cols | nogapr, jnp.ones((b, h, rows, 1), bool)],
                axis=-1)
            r_factor = jnp.sum(jnp.where(partial, probs, 0.0), axis=-1)
            comp = jnp.einsum("bhqk,bhkd->bhqd",
                              jnp.where(partial[..., :nb], 0.0,
                                        probs[..., :nb]), vp,
                              preferred_element_type=jnp.float32)
            return vis_cols, r_factor, comp

        out0 = (jnp.zeros((b, h, nb_l, nb), bool),
                jnp.zeros((b, h, nb_l), jnp.float32),
                jnp.zeros((b, h, nb_l, d), jnp.float32))
        vis_cols, r_factor, comp = _row_tiled(
            plan_tile, nb_l, cfg.plan_row_chunk, out0)

        # ---- visual rows: ring over visual KV shards ----
        tlen0 = jnp.zeros((b,), jnp.int32)
        o = jnp.zeros((b, h, s_l, d), jnp.float32)
        m = jnp.full((b, h, s_l), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, h, s_l), jnp.float32)
        # text rows: exact attention, ring-merged over the same shards
        ot = jnp.zeros((b, h, t, d), jnp.float32)
        mt = jnp.full((b, h, t), -jnp.inf, jnp.float32)
        lt = jnp.zeros((b, h, t), jnp.float32)
        full_vis = jnp.broadcast_to(
            jnp.arange(nb_l, dtype=jnp.int32), (b, h, tb, nb_l))
        full_vis_cnt = jnp.full((b, h, tb), nb_l, jnp.int32)
        kvb = kv_args[0] if kv_packed is not None else None
        kb, vb = ks, vs
        for step in range(n):
            src = (me - step) % n
            sub = jax.lax.dynamic_slice(
                vis_cols, (0, 0, 0, src * nb_l), (b, h, nb_l, nb_l))
            idx, cnt = ops.mask_to_indices(sub)
            if kv_packed is not None:
                kb, vb = kvb[..., :d], kvb[..., d:]
            o_p, m_p, l_p = block_sparse_flash_attention(
                qs, kb, vb, idx, cnt, tlen0, visual_len=s_l,
                text_start=None, block_m=cfg.block_m, block_n=bn,
                interpret=interpret, return_stats=True, packed_kv=kvb)
            o, m, l = _merge(o, m, l, o_p, m_p, l_p)
            op_t, mp_t, lp_t = block_sparse_flash_attention(
                qt, kb, vb, full_vis, full_vis_cnt, tlen0,
                visual_len=s_l, text_start=None, block_m=cfg.block_m,
                block_n=bn, interpret=interpret, return_stats=True,
                packed_kv=kvb)
            ot, mt, lt = _merge(ot, mt, lt, op_t, mp_t, lp_t)
            if step < n - 1:
                perm = [(i, (i + 1) % n) for i in range(n)]
                if kv_packed is not None:
                    kvb = jax.lax.ppermute(kvb, seq_axis, perm)
                else:
                    kb = jax.lax.ppermute(kb, seq_axis, perm)
                    vb = jax.lax.ppermute(vb, seq_axis, perm)

        # ---- local text passes (text KV replicated; text blocks are
        # force-included for every visual query, so no plan needed) ----
        full_txt = jnp.broadcast_to(
            jnp.arange(tb, dtype=jnp.int32), (b, h, nb_l, tb))
        full_txt_cnt = jnp.full((b, h, nb_l), tb, jnp.int32)
        o_p, m_p, l_p = block_sparse_flash_attention(
            qs, kt, vt, full_txt, full_txt_cnt, tlen, visual_len=0,
            text_start=0, block_m=cfg.block_m, block_n=bn,
            interpret=interpret, return_stats=True)
        o, m, l = _merge(o, m, l, o_p, m_p, l_p)
        full_txt_t = jnp.broadcast_to(
            jnp.arange(tb, dtype=jnp.int32), (b, h, tb, tb))
        op_t, mp_t, lp_t = block_sparse_flash_attention(
            qt, kt, vt, full_txt_t, jnp.full((b, h, tb), tb, jnp.int32),
            tlen, visual_len=0, text_start=0, block_m=cfg.block_m,
            block_n=bn, interpret=interpret, return_stats=True)
        ot, _, _ = _merge(ot, mt, lt, op_t, mp_t, lp_t)

        out_vis = o * r_factor.repeat(cfg.block_m, axis=-1)[..., None] + \
            comp.repeat(cfg.block_m, axis=-2)
        return out_vis.astype(qs.dtype), ot.astype(qt.dtype)

    spec = P(None, None, seq_axis, None)
    rep = P(None, None, None, None)
    kv_in = (spec,) if kv_packed is not None else (spec, spec)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec, P(None, None), rep, rep, rep, P(None)) + kv_in,
        out_specs=(spec, rep), check_vma=False)
    if kv_packed is not None:
        return fn(q, neighbor_mask, q_text, k_text, v_text,
                  jnp.asarray(text_len_rt, jnp.int32), kv_packed)
    return fn(q, neighbor_mask, q_text, k_text, v_text,
              jnp.asarray(text_len_rt, jnp.int32), k, v)

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

v1 scope: visual layout (Wan-style self-attention); the sequence must be
pre-padded so S == visual_len and S/n is a multiple of the block size.
Joint-layout (trailing text) support is tracked in ROADMAP.md.
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
) -> jax.Array:
    """Returns [B, H, S, D]; sharded over seq_axis on entry and exit."""
    assert cfg.layout == "visual", "ring v1 supports the visual layout"
    n = mesh.shape[seq_axis]
    b, h, s, d = q.shape
    bn = cfg.block_n
    assert s % (n * cfg.block_m) == 0, (s, n, cfg.block_m)
    s_l = s // n
    nb_l = s_l // bn
    nb = nb_l * n

    if neighbor_mask is None:
        neighbor_mask = jnp.zeros((nb, nb), bool)

    def local(qs, ks, vs, nbm):
        me = jax.lax.axis_index(seq_axis)
        # ---- global pooled stats from tiny all-gathers ----
        kp_l = ops.block_pool(ks, bn)                       # [B,H,NBl,D]
        vp_l = ops.block_pool(vs, bn)
        kb_l = ks.reshape(b, h, nb_l, bn, d)
        dk_l = jnp.mean(jnp.abs(kb_l.astype(jnp.float32)
                                - kp_l[..., None, :]), axis=-2)
        kp = jax.lax.all_gather(kp_l, seq_axis, axis=2, tiled=True)
        vp = jax.lax.all_gather(vp_l, seq_axis, axis=2, tiled=True)
        dk = jax.lax.all_gather(dk_l, seq_axis, axis=2, tiled=True)

        # ---- global-mask plan for the local query rows ----
        qb = qs.reshape(b, h, nb_l, cfg.block_m, d)
        qp = jnp.mean(qb.astype(jnp.float32), axis=-2)
        scores_u = ops.pooled_scores(qp, kp)                # [B,H,NQl,NB]
        probs = jax.nn.softmax(scores_u * (d ** -0.5), axis=-1)
        iq, jk = cfg.block_m, bn
        dq = jnp.mean(jnp.abs(qb.astype(jnp.float32) - qp[..., None, :]),
                      axis=-2)
        err = (jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", dq, kp)) * iq * jk
               + jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", qp, dk)) * iq * jk)
        nogapr = ~((iq * jk) * jnp.abs(scores_u) > err)

        onehot = ops.topp_threshold_onehot(probs, cfg.p_remain,
                                           cfg.top_k_floor)
        nb_rows = jax.lax.dynamic_slice(
            nbm, (me * nb_l, 0), (nb_l, nb))                # my rows
        mask = onehot | nb_rows[None, None]
        if cfg.first_frame_blocks > 0:
            row_g = me * nb_l + jnp.arange(nb_l)
            col_g = jnp.arange(nb)
            ff = ((row_g[:, None] < cfg.first_frame_blocks)
                  & (col_g[None, :] < cfg.first_frame_blocks))
            mask = mask | ff[None, None]

        partial = mask | nogapr
        r_factor = jnp.sum(jnp.where(partial, probs, 0.0), axis=-1)
        comp = jnp.einsum("bhqk,bhkd->bhqd",
                          jnp.where(partial, 0.0, probs), vp,
                          preferred_element_type=jnp.float32)

        # ---- ring execution over KV shards ----
        tlen0 = jnp.zeros((b,), jnp.int32)
        o = jnp.zeros((b, h, s_l, d), jnp.float32)
        m = jnp.full((b, h, s_l), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, h, s_l), jnp.float32)
        kb, vb = ks, vs
        for step in range(n):
            src = (me - step) % n          # owner of the resident shard
            sub = jax.lax.dynamic_slice(
                mask, (0, 0, 0, src * nb_l), (b, h, nb_l, nb_l))
            idx, cnt = ops.mask_to_indices(sub)
            o_p, m_p, l_p = block_sparse_flash_attention(
                qs, kb, vb, idx, cnt, tlen0, visual_len=s_l,
                text_start=None, block_m=cfg.block_m, block_n=bn,
                interpret=interpret, return_stats=True)
            # shift partial max by nothing — scores are translation-free
            # across shards (same scale), so m/l merge directly
            o, m, l = _merge(o, m, l, o_p, m_p, l_p)
            if step < n - 1:
                perm = [(i, (i + 1) % n) for i in range(n)]
                kb = jax.lax.ppermute(kb, seq_axis, perm)
                vb = jax.lax.ppermute(vb, seq_axis, perm)

        out = o * r_factor.repeat(cfg.block_m, axis=-1)[..., None] + \
            comp.repeat(cfg.block_m, axis=-2)
        return out.astype(qs.dtype)

    spec = P(None, None, seq_axis, None)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec, spec, P(None, None)),
                   out_specs=spec, check_vma=False)
    return fn(q, k, v, neighbor_mask)

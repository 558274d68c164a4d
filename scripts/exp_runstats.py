"""Measure contiguous-run statistics of sparse-plan index lists.

Sizes the kernel run-coalescing win (ROADMAP "Performance"): for each
(head, q-row) the kernel currently issues one DMA descriptor per selected
block; coalescing contiguous index runs into aligned power-of-two DMAs
divides descriptor-issue work.  Reports the descriptor count before/after
on (a) peaked spatially-smooth inputs (the real-model regime: pooled
attention concentrates on nearby-curve blocks) and (b) iid random inputs
(the round-1 bench regime).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from rectified_spaattn_tpu.curves import cached_curve
from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
from rectified_spaattn_tpu.sparse.pipeline import build_sparse_plan


def smooth_inputs(key, b, h, s_vis, text_len, d, coords, alpha, sigma):
    """Token features = low-frequency function of 3-D position + noise."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    nfreq = 16
    w = jax.random.normal(k1, (3, nfreq)) * 3.0          # low frequencies
    phase = jax.random.uniform(k2, (nfreq,)) * 2 * np.pi
    proj = coords @ w + phase                            # [S,nfreq]
    basis = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)  # [S,32]
    mix = jax.random.normal(k3, (h, 2 * nfreq, d)) / np.sqrt(2 * nfreq)
    field = jnp.einsum("sf,hfd->hsd", basis, mix)        # [H,S,D]
    noise = jax.random.normal(k4, (2, h, s_vis + text_len, d))
    def tok(i):
        base = jnp.pad(field, ((0, 0), (0, text_len), (0, 0)))
        return (alpha * base + sigma * noise[i])[None].astype(jnp.bfloat16)
    return tok(0), tok(1)                                # q, k


def dma_decomposition(indices, counts, chunk=16):
    """Hierarchical aligned power-of-two run decomposition (vectorized).

    Returns dlen [..., NB] int32: slot i issues a DMA of dlen[i] blocks
    (0 = covered by an earlier run).  Runs never cross ``chunk``-slot
    boundaries and are aligned (slot % len == 0) so every descriptor is a
    static shape the kernel can switch on.
    """
    nb = indices.shape[-1]
    pad = (-nb) % chunk
    if pad:
        indices = np.concatenate(
            [indices, np.full(indices.shape[:-1] + (pad,), -10, indices.dtype)],
            axis=-1)
    nbp = nb + pad
    slot = np.arange(nbp)
    contig = np.zeros(indices.shape, bool)
    contig[..., 1:] = indices[..., 1:] == indices[..., :-1] + 1
    contig[..., slot % chunk == 0] = False               # chunk boundary
    dlen = np.zeros(indices.shape, np.int32)
    covered = np.zeros(indices.shape, bool)
    for c in range(int(np.log2(chunk)), -1, -1):
        ln = 1 << c
        # solid iff every interior slot of the aligned 2^c segment continues
        # the run (contig true at offsets 1..ln-1)
        solid = np.ones(indices[..., ::ln].shape, bool)
        for off in range(1, ln):
            solid &= contig[..., off::ln]
        sel = solid & ~covered[..., ::ln]
        dlen[..., ::ln] = np.where(sel & (dlen[..., ::ln] == 0),
                                   ln, dlen[..., ::ln])
        for off in range(ln):
            covered[..., off::ln] |= sel
    return dlen[..., :nb]


def stats(plan, label, chunk=16):
    idx = np.asarray(plan.indices)
    cnt = np.asarray(plan.counts)
    nb = idx.shape[-1]
    dlen = dma_decomposition(idx, cnt, chunk)
    slot = np.arange(nb)
    # only slots inside issued chunks count (the kernel DMAs padding lanes
    # of the final chunk too)
    nchunks = (cnt + chunk - 1) // chunk
    live = slot[None, None, None] < (nchunks * chunk)[..., None]
    n_desc_now = live.sum()
    n_desc_coal = ((dlen > 0) & live).sum()
    density = cnt.mean() / nb
    sizes, freq = np.unique(dlen[(dlen > 0) & live], return_counts=True)
    print(f"[{label}] density={density:.3f} mean_count={cnt.mean():.0f} "
          f"descriptors {n_desc_now} -> {n_desc_coal} "
          f"({n_desc_now / n_desc_coal:.2f}x fewer)")
    print(f"    run-size histogram: "
          + ", ".join(f"{s}:{f / n_desc_coal:.2%}" for s, f in zip(sizes, freq)))


def main():
    jax.config.update("jax_platforms", "cpu")   # stats only — no chip
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--lt", type=int, default=32)
    ap.add_argument("--lh", type=int, default=45)
    ap.add_argument("--lw", type=int, default=80)
    ap.add_argument("--alpha", type=float, default=4.0)
    ap.add_argument("--sigma", type=float, default=1.0)
    args = ap.parse_args()

    b, h, d = 1, args.heads, 128
    lt, lh, lw = args.lt, args.lh, args.lw
    text_len = 256
    sv = lt * lh * lw
    img_blocks = sv // 128

    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    cfg = SparseConfig(top_k_floor=max(1, select_block_num(0.8, img_blocks)),
                       p_remain=0.3, layout="joint", text_len=text_len)
    nmask = jnp.asarray(neighbors)

    # 3-D coordinates of each curve-ordered token, normalised to [0,1]
    lin = np.asarray(h2l)
    tt, hh, ww = np.unravel_index(lin, (lt, lh, lw))
    coords = jnp.asarray(
        np.stack([tt / lt, hh / lh, ww / lw], -1), jnp.float32)

    key = jax.random.PRNGKey(0)
    plan_fn = jax.jit(lambda q, k: build_sparse_plan(
        q[:, :, :sv], k, k, cfg, neighbor_mask=nmask))

    for label, (alpha, sigma) in (("peaked", (args.alpha, args.sigma)),
                                  ("random", (0.0, 1.0))):
        q, k = smooth_inputs(key, b, h, sv, text_len, d, coords, alpha, sigma)
        t0 = time.time()
        plan = jax.block_until_ready(plan_fn(q, k))
        print(f"[{label}] plan built in {time.time() - t0:.1f}s")
        stats(plan, label)


if __name__ == "__main__":
    main()


def union_growth(plan_mask, groups=(2, 4, 8)):
    """Mean union-size growth of G adjacent rows vs a single row."""
    m = np.asarray(plan_mask)
    b, h, nq, nb = m.shape
    single = m.sum(-1).mean()
    out = {}
    for g in groups:
        nqg = nq - nq % g
        mg = m[:, :, :nqg].reshape(b, h, nqg // g, g, nb)
        u = mg.any(-2).sum(-1).mean()
        out[g] = (u, u / single)
    return single, out

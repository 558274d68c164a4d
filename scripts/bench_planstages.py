"""Stage-level breakdown of the sparse-plan build at the Hunyuan point.

The full plan (pool -> scores/softmax -> GAPR -> IPAR -> bisect top-p ->
mask assembly -> rectification -> mask->indices) measures ~58 ms fused
(RESULTS_r2.md) against a hand-computed traffic floor of ~15 ms.  This
script times each stage as its own jitted program (intermediates staged
as device inputs) to attribute the gap, then measures candidate
replacements for whichever stages dominate.

Run: python scripts/bench_planstages.py   (TPU, ~10 distinct compiles)
"""

import argparse
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def smooth_inputs(key, b, h, s_vis, text_len, d, coords, alpha, sigma):
    @jax.jit
    def one(noise_key):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 7), 3)
        nfreq = 16
        w = jax.random.normal(k1, (3, nfreq)) * 3.0
        phase = jax.random.uniform(k2, (nfreq,)) * 2 * np.pi
        proj = coords @ w + phase
        basis = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)
        mix = jax.random.normal(k3, (h, 2 * nfreq, d)) / np.sqrt(2 * nfreq)
        field = jnp.einsum("sf,hfd->hsd", basis, mix)
        field = jnp.pad(field, ((0, 0), (0, text_len), (0, 0)))
        noise = jax.random.normal(noise_key, (h, s_vis + text_len, d))
        return (alpha * field + sigma * noise)[None].astype(jnp.bfloat16)
    ks = jax.random.split(key, 3)
    return tuple(jax.block_until_ready(one(k)) for k in ks)


def timed(f, *xs, n=4):
    out = f(*xs)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
    from rectified_spaattn_tpu.sparse.pipeline import build_sparse_plan, NEG_INF
    from rectified_spaattn_tpu.sparse import ops
    from rectified_spaattn_tpu.curves import cached_curve

    b, h, d = 1, 24, 128
    lt, lh, lw = 32, 45, 80
    text_len = 256
    sv = lt * lh * lw
    nq = sv // 128
    img_blocks = nq

    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    nmask = jnp.asarray(neighbors)
    cfg = SparseConfig(top_k_floor=max(1, select_block_num(0.8, img_blocks)),
                       p_remain=0.3, layout="joint", text_len=text_len)

    lin = np.asarray(h2l)
    tt, hh, ww = np.unravel_index(lin, (lt, lh, lw))
    coords = jnp.asarray(np.stack([tt / lt, hh / lh, ww / lw], -1),
                         jnp.float32)

    key = jax.random.PRNGKey(0)
    q, k, v = smooth_inputs(key, b, h, sv, text_len, d, coords,
                            args.alpha, 1.0)
    qv = q[:, :, :sv]

    # ---- full plan (reference point) ----
    plan_fn = jax.jit(lambda q, k, v: build_sparse_plan(
        q[:, :, :sv], k, v, cfg, neighbor_mask=nmask))
    log("compiling full plan...")
    t_full = timed(plan_fn, q, k, v, n=args.reps)
    log(f"full plan: {t_full*1e3:.1f} ms")

    # ---- stage the intermediates ----
    bm = bn = 128

    @jax.jit
    def s_pool(qv, k):
        q_pool = ops.block_pool(qv, bm)
        k_pool_vis = ops.block_pool(k[:, :, :nq * bn], bn)
        return q_pool, k_pool_vis

    @jax.jit
    def s_scores(q_pool, k_pool_vis, k):
        key_text = k[:, :, nq * bn: nq * bn + text_len].astype(jnp.float32)
        k_cols = jnp.concatenate([k_pool_vis, key_text], axis=-2)
        scores_unscaled = ops.pooled_scores(q_pool, k_cols)
        probs_tok = jax.nn.softmax(scores_unscaled * (d ** -0.5), axis=-1)
        return scores_unscaled, probs_tok

    @jax.jit
    def s_gapr(qv, k, q_pool, k_pool_vis, scores_unscaled):
        q_blocks = qv.reshape(b, h, nq, bm, d)
        k_blocks = k[:, :, :nq * bn].reshape(b, h, nq, bn, d)
        return ops.estimate_pr_gain(q_blocks, k_blocks, q_pool, k_pool_vis,
                                    scores_unscaled[..., :nq])

    @jax.jit
    def s_ipar(probs_tok):
        return ops.ipar_reallocate(probs_tok, nq, bn)

    @jax.jit
    def s_bisect(probs):
        return ops.topp_threshold_onehot_bisect(probs, cfg.p_remain,
                                                cfg.top_k_floor)

    @jax.jit
    def s_mask(onehot_sel):
        vis_cols = onehot_sel[..., :nq] | nmask[None, None, :nq, :nq]
        text_cols = jnp.ones((b, h, nq, cfg.text_blocks), bool)
        return jnp.concatenate([vis_cols, text_cols], axis=-1)

    @jax.jit
    def s_rect(probs, vis_sel, nogapr, v):
        partial = jnp.concatenate(
            [vis_sel | nogapr, jnp.ones((b, h, nq, 1), bool)], axis=-1)
        value_pool = ops.block_pool(v, bn)[:, :, :nq + 1]
        return ops.rectification(probs, partial, value_pool)

    @jax.jit
    def s_m2i(block_mask):
        return ops.mask_to_indices(block_mask)

    q_pool, k_pool_vis = jax.block_until_ready(s_pool(qv, k))
    scores_unscaled, probs_tok = jax.block_until_ready(
        s_scores(q_pool, k_pool_vis, k))
    nogapr = jax.block_until_ready(s_gapr(qv, k, q_pool, k_pool_vis,
                                          scores_unscaled))
    probs = jax.block_until_ready(s_ipar(probs_tok))
    onehot = jax.block_until_ready(s_bisect(probs))
    vis_sel = onehot[..., :nq] | nmask[None, None, :nq, :nq]
    block_mask = jax.block_until_ready(s_mask(onehot))

    stages = [
        ("pool(q,k)", lambda: timed(s_pool, qv, k, n=args.reps)),
        ("scores+softmax", lambda: timed(s_scores, q_pool, k_pool_vis, k,
                                         n=args.reps)),
        ("gapr", lambda: timed(s_gapr, qv, k, q_pool, k_pool_vis,
                               scores_unscaled, n=args.reps)),
        ("ipar", lambda: timed(s_ipar, probs_tok, n=args.reps)),
        ("bisect-topp", lambda: timed(s_bisect, probs, n=args.reps)),
        ("mask-assembly", lambda: timed(s_mask, onehot, n=args.reps)),
        ("rectification", lambda: timed(s_rect, probs, vis_sel, nogapr, v,
                                        n=args.reps)),
        ("mask->indices", lambda: timed(s_m2i, block_mask, n=args.reps)),
    ]
    total = 0.0
    for name, fn in stages:
        log(f"compiling {name}...")
        t = fn()
        total += t
        log(f"  {name}: {t*1e3:.2f} ms")
    log(f"stage sum: {total*1e3:.1f} ms vs fused full {t_full*1e3:.1f} ms")

    density = float(jnp.mean(jnp.sum(block_mask, -1))) / block_mask.shape[-1]
    log(f"mask density {density:.3f}")


if __name__ == "__main__":
    main()

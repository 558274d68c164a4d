"""Amortised (true device-time) breakdown of the sparse-plan build.

bench_planstages.py revealed that ONE timed call through the axon tunnel
carries ~30 ms of dispatch+readback overhead (a trivial elementwise stage
measures the same ~30 ms as the full plan's 61 ms).  This script loops
each stage K times INSIDE one jit with a forced data dependency (a scalar
from iteration i's output perturbs iteration i+1's input) and reads back
once, so per-iteration time is true device time.

Run: python scripts/bench_planstages2.py
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


def amortized(stage, inputs, perturb_idx, K):
    """Time ``stage(*inputs)`` looped K times in one jit.

    perturb_idx: which input gets the dependency-forcing scalar added to
    its [0,...,0] element (must be a float/bf16 array).
    """
    @jax.jit
    def loop(*xs):
        def body(i, carry):
            s = carry
            xs2 = list(xs)
            x = xs2[perturb_idx]
            flat_first = (0,) * x.ndim
            xs2[perturb_idx] = x.at[flat_first].add(
                (s * 1e-20).astype(x.dtype))
            out = stage(*xs2)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:4]
                           .astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    r = loop(*inputs)
    float(r)  # compile + warm
    t0 = time.perf_counter()
    float(loop(*inputs))
    return (time.perf_counter() - t0) / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=4.0)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    K = args.k

    from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
    from rectified_spaattn_tpu.sparse.pipeline import build_sparse_plan
    from rectified_spaattn_tpu.sparse import ops
    from rectified_spaattn_tpu.curves import cached_curve

    b, h, d = 1, 24, 128
    lt, lh, lw = 32, 45, 80
    text_len = 256
    sv = lt * lh * lw
    nq = sv // 128

    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    nmask = jnp.asarray(neighbors)
    cfg = SparseConfig(top_k_floor=max(1, select_block_num(0.8, nq)),
                       p_remain=0.3, layout="joint", text_len=text_len)

    lin = np.asarray(h2l)
    tt, hh, ww = np.unravel_index(lin, (lt, lh, lw))
    coords = jnp.asarray(np.stack([tt / lt, hh / lh, ww / lw], -1),
                         jnp.float32)

    key = jax.random.PRNGKey(0)
    q, k, v = smooth_inputs(key, b, h, sv, text_len, d, coords,
                            args.alpha, 1.0)
    qv = q[:, :, :sv]
    bm = bn = 128

    # ---- intermediates (one-shot) ----
    q_pool = ops.block_pool(qv, bm)
    k_pool_vis = ops.block_pool(k[:, :, :nq * bn], bn)
    key_text = k[:, :, nq * bn: nq * bn + text_len].astype(jnp.float32)
    k_cols = jnp.concatenate([k_pool_vis, key_text], axis=-2)
    scores_unscaled = ops.pooled_scores(q_pool, k_cols)
    probs_tok = jax.nn.softmax(scores_unscaled * (d ** -0.5), axis=-1)
    probs = ops.ipar_reallocate(probs_tok, nq, bn)
    onehot = ops.topp_threshold_onehot_bisect(probs, cfg.p_remain,
                                              cfg.top_k_floor)
    vis_sel = onehot[..., :nq] | nmask[None, None, :nq, :nq]
    block_mask = jnp.concatenate(
        [vis_sel, jnp.ones((b, h, nq, cfg.text_blocks), bool)], axis=-1)
    block_mask = jax.block_until_ready(block_mask)
    probs = jax.block_until_ready(probs)
    q_pool = jax.block_until_ready(q_pool)
    k_pool_vis = jax.block_until_ready(k_pool_vis)
    scores_unscaled = jax.block_until_ready(scores_unscaled)
    probs_tok = jax.block_until_ready(probs_tok)

    # noop reference: dispatch floor inside the loop should be ~0
    t = amortized(lambda x: x[..., :4] + 1.0, (probs,), 0, K)
    log(f"noop slice: {t*1e3:.2f} ms")

    t = amortized(lambda q, k: (ops.block_pool(q, bm),
                                ops.block_pool(k[:, :, :nq * bn], bn)),
                  (qv, k), 0, K)
    log(f"pool(q,k): {t*1e3:.2f} ms")

    def s_scores(q_pool, k):
        key_text = k[:, :, nq * bn: nq * bn + text_len].astype(jnp.float32)
        kc = jnp.concatenate([k_pool_vis, key_text], axis=-2)
        su = ops.pooled_scores(q_pool, kc)
        return jax.nn.softmax(su * (d ** -0.5), axis=-1)
    t = amortized(s_scores, (q_pool, k), 0, K)
    log(f"scores+softmax: {t*1e3:.2f} ms")

    def s_gapr(qv, k):
        q_blocks = qv.reshape(b, h, nq, bm, d)
        k_blocks = k[:, :, :nq * bn].reshape(b, h, nq, bn, d)
        return ops.estimate_pr_gain(q_blocks, k_blocks, q_pool, k_pool_vis,
                                    scores_unscaled[..., :nq])
    t = amortized(s_gapr, (qv, k), 0, K)
    log(f"gapr: {t*1e3:.2f} ms")

    t = amortized(lambda p: ops.ipar_reallocate(p, nq, bn), (probs_tok,),
                  0, K)
    log(f"ipar: {t*1e3:.2f} ms")

    t = amortized(lambda p: ops.topp_threshold_onehot_bisect(
        p, cfg.p_remain, cfg.top_k_floor), (probs,), 0, K)
    log(f"bisect-topp: {t*1e3:.2f} ms")

    def s_rect(probs, v):
        partial = jnp.concatenate(
            [vis_sel, jnp.ones((b, h, nq, 1), bool)], axis=-1)
        value_pool = ops.block_pool(v, bn)[:, :, :nq + 1]
        return ops.rectification(probs, partial, value_pool)
    t = amortized(s_rect, (probs, v), 0, K)
    log(f"rectification(+vpool): {t*1e3:.2f} ms")

    def s_m2i(p):
        # rebuild the mask from a float input so the perturbation flows
        bmask = (p[..., :nq] > 1e-9) | nmask[None, None, :nq, :nq]
        bmask = jnp.concatenate(
            [bmask, jnp.ones((b, h, nq, cfg.text_blocks), bool)], axis=-1)
        return ops.mask_to_indices(bmask)
    t = amortized(s_m2i, (probs,), 0, K)
    log(f"mask(from p)+mask->indices: {t*1e3:.2f} ms")

    # int16 sort variant of mask_to_indices
    def m2i_16(p):
        bmask = (p[..., :nq] > 1e-9) | nmask[None, None, :nq, :nq]
        bmask = jnp.concatenate(
            [bmask, jnp.ones((b, h, nq, cfg.text_blocks), bool)], axis=-1)
        nb = bmask.shape[-1]
        counts = jnp.sum(bmask, axis=-1).astype(jnp.int32)
        col = jnp.arange(nb, dtype=jnp.int16)
        key16 = jnp.where(bmask, col, col + jnp.int16(nb))
        indices = jnp.sort(key16, axis=-1).astype(jnp.int32)
        last = jnp.take_along_axis(
            indices, jnp.maximum(counts - 1, 0)[..., None], axis=-1)
        slot = jnp.arange(nb, dtype=jnp.int32)[(None,) * 3]
        indices = jnp.where(slot < counts[..., None], indices, last)
        return jnp.minimum(indices, nb - 1), counts
    t = amortized(m2i_16, (probs,), 0, K)
    log(f"mask(from p)+mask->indices int16 sort: {t*1e3:.2f} ms")

    # full plan amortised
    t = amortized(lambda q, k, v: build_sparse_plan(
        q[:, :, :sv], k, v, cfg, neighbor_mask=nmask), (q, k, v), 0,
        max(4, K // 2))
    log(f"FULL plan (amortised): {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()

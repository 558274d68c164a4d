"""Grouped-rows kernel benchmark on MODEL-STATISTICS masks (real chip).

VERDICT r1 weak #2: the gather kernel is HBM-bound because every query row
re-fetches its own copy of the selected KV blocks.  Grouped execution
fetches the UNION of G adjacent rows once.  Its win depends on mask
overlap, which random iid inputs understate badly: real diffusion
attention is spatially smooth, so adjacent Gilbert query blocks select
heavily overlapping key sets.  This bench builds the plan from smooth
low-frequency q/k fields (peaked pooled scores — the realistic regime)
at the Hunyuan 720p operating point and times G in {1, 2, 4, 8}.

Usage:  python scripts/bench_grouped.py [--small] [--groups 1,2,4,8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def realistic_qkv(rng, b, h, grid, text_len, d, h2l, smooth=1.0, noise=0.5):
    """Spatially smooth token fields in Gilbert order + a text tail.

    A coarse random field is trilinearly upsampled over the (t,h,w) grid so
    pooled block statistics vary smoothly along the curve — the regime real
    DiT attention lives in (neighboring blocks want similar keys)."""
    import jax
    import jax.numpy as jnp
    lt, lh, lw = grid
    ks = jax.random.split(rng, 7)

    def field(k1, k2):
        coarse = jax.random.normal(
            k1, (b, h, max(2, lt // 4), max(2, lh // 8), max(2, lw // 8), d),
            jnp.float32)
        f = jax.image.resize(coarse, (b, h, lt, lh, lw, d), "linear")
        f = f.reshape(b, h, lt * lh * lw, d)
        f = f[:, :, h2l]                       # linear -> curve order
        return smooth * f + noise * jax.random.normal(
            k2, f.shape, jnp.float32)

    qv, kv_, vv = field(ks[0], ks[1]), field(ks[2], ks[3]), field(ks[4], ks[5])
    text = jax.random.normal(ks[6], (b, h, text_len, d), jnp.float32)
    cat = lambda a, t: jnp.concatenate([a, t], axis=2).astype(jnp.bfloat16)
    return cat(qv, text), cat(kv_, text), cat(vv, text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="1/8-scale shapes for a quick check")
    ap.add_argument("--groups", type=str, default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--drop", type=float, default=0.8)
    ap.add_argument("--kv_quant", default="none",
                    choices=("none", "int8", "mxu8"),
                    help="int8 KV gather (halves the byte-bound kernel's "
                         "HBM traffic); mxu8 feeds the MXU int8 directly "
                         "(no dequant relayout)")
    ap.add_argument("--chunks", type=str, default="",
                    help="comma list of kernel chunk_blocks to sweep at "
                         "G=1 (default: the config default only)")
    ap.add_argument("--shared_field", action="store_true",
                    help="q/k share one smooth field (stronger diagonal "
                         "structure; union_growth ~1.15 at G=2 vs ~1.45 "
                         "for independent fields)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.sparse import (SparseConfig, select_block_num,
                                              build_sparse_plan)
    from rectified_spaattn_tpu.sparse.ops import group_rows, mask_to_indices
    from rectified_spaattn_tpu.curves import cached_curve

    b, h, d = 1, 24, 128
    if args.small:
        lt, lh, lw = 8, 24, 32
        text_len = 256
    else:
        lt, lh, lw = 32, 45, 80          # 720p 128f -> 115200 visual tokens
        text_len = 256
    sv = lt * lh * lw
    s = sv + text_len
    groups = [int(g) for g in args.groups.split(",")]

    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    neighbors = jnp.asarray(neighbors)
    img_blocks = sv // 128
    base_cfg = dict(
        top_k_floor=max(1, select_block_num(args.drop, img_blocks)),
        p_remain=0.3, layout="joint", text_len=text_len)

    rng = jax.random.PRNGKey(0)
    if args.shared_field:
        from exp_runstats import smooth_inputs
        lin = np.asarray(h2l)
        tt, hh, ww = np.unravel_index(lin, (lt, lh, lw))
        coords = jnp.asarray(np.stack([tt / lt, hh / lh, ww / lw], -1),
                             jnp.float32)
        q, k = smooth_inputs(rng, b, h, sv, text_len, d, coords, 4.0, 1.0)
        v = k
    else:
        q, k, v = realistic_qkv(rng, b, h, (lt, lh, lw), text_len, d,
                                jnp.asarray(h2l))
    tlen = jnp.full((b,), text_len, jnp.int32)

    def sync(x):
        float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))

    def timed(f, *a, n=args.iters):
        out = f(*a)
        sync(out if isinstance(out, jax.Array) else out[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
            sync(out if isinstance(out, jax.Array) else out[0])
        return (time.perf_counter() - t0) / n, out

    # ---- mask statistics at this operating point (realistic inputs) ----
    cfg0 = SparseConfig(**base_cfg)
    pad = (-sv) % 128
    if pad:
        raise SystemExit("operating point must be 128-aligned")
    valid = jnp.ones((b, s), bool)
    plan_fn = jax.jit(lambda q, k, v: build_sparse_plan(
        q[:, :, :sv], k, v, cfg0, neighbor_mask=neighbors,
        text_valid=jnp.ones((b, text_len), bool)))
    t_plan, plan = timed(plan_fn, q, k, v)
    mask = np.asarray(plan.block_mask)
    counts = mask.sum(-1)
    stats = {"plan_ms": round(t_plan * 1e3, 1),
             "density": round(float(counts.mean()) / mask.shape[-1], 4),
             "mean_count": round(float(counts.mean()), 1)}
    for g in groups:
        if g == 1:
            continue
        nq = mask.shape[2]
        nqp = nq - nq % g
        mg = mask[:, :, :nqp].reshape(b, h, nqp // g, g, -1)
        u = mg.any(-2).sum(-1)
        stats[f"union_growth_g{g}"] = round(
            float(u.mean() / (mg.sum((-1, -2)).mean() / g)), 3)
    print("mask stats:", json.dumps(stats), flush=True)

    # ---- kernel timings ----
    results = {"stats": stats, "groups": {}}
    for g in groups:
        cfg = SparseConfig(**base_cfg, group_rows=g,
                           kv_quant=args.kv_quant if g == 1 else "none")
        fn = jax.jit(lambda q, k, v, cfg=cfg: rectified_sparse_attention(
            q, k, v, cfg, neighbors, visual_len=sv, text_len_rt=tlen))
        t, _ = timed(fn, q, k, v)
        results["groups"][g] = round(t * 1e3, 1)
        print(f"group={g}: full sparse path {t*1e3:.1f} ms", flush=True)

    if args.chunks:
        results["chunks"] = {}
        for c in (int(x) for x in args.chunks.split(",")):
            cfg = SparseConfig(**base_cfg, chunk_blocks=c,
                               kv_quant=args.kv_quant)
            fn = jax.jit(
                lambda q, k, v, cfg=cfg: rectified_sparse_attention(
                    q, k, v, cfg, neighbors, visual_len=sv,
                    text_len_rt=tlen))
            t, _ = timed(fn, q, k, v)
            results["chunks"][c] = round(t * 1e3, 1)
            print(f"chunk={c}: full sparse path {t*1e3:.1f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

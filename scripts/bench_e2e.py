"""End-to-end transformer-step benchmark at HunyuanVideo scale.

Real token count (115 200 visual + 256 text), real width (3072 hidden /
24 heads), truncated depth (1 dual + 2 single blocks) — measures the
practical dense→sparse speedup of the full layer mix (attention + MLP +
plan build + rectification), not just the attention op.

    python scripts/bench_e2e.py [--dual 1 --single 2 --steps 2]
"""

import argparse
import time
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dual", type=int, default=1)
    ap.add_argument("--single", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frame", type=int, default=128)
    ap.add_argument("--sa_drop_rate", type=float, default=0.8)
    ap.add_argument("--hidden", type=int, default=3072)
    ap.add_argument("--teacache", action="store_true",
                    help="also time sparse+TeaCache (forced mid-step skips)")
    ap.add_argument("--teacache-only", action="store_true",
                    help="skip the sparse/flash baselines (fresh-process "
                         "HBM for the TeaCache tier)")
    args = ap.parse_args()
    if args.teacache_only:
        args.teacache = True

    from rectified_spaattn_tpu.models.hunyuan import (
        HunyuanVideoConfig, HunyuanVideoDiT)
    from rectified_spaattn_tpu.pipelines import HunyuanVideoPipeline

    cfg = HunyuanVideoConfig(
        hidden_dim=args.hidden, heads=args.hidden // 128,
        num_dual_blocks=args.dual, num_single_blocks=args.single,
        text_dim=1024, pooled_dim=256, num_refiner_blocks=1)
    model = HunyuanVideoDiT(cfg)
    log(f"init params (hidden {cfg.hidden_dim}, {args.dual}+{args.single} "
        f"blocks)...")
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 256, cfg.text_dim), jnp.float32)
    mask = jnp.zeros((1, 256), bool).at[:, :40].set(True)
    # params are independent of the token count: init on a tiny grid
    lat_small = jnp.zeros((1, cfg.in_channels, 4, 16, 16))
    params = model.init(rng, lat_small, jnp.array([0.0]), text, mask,
                        jnp.array([6000.0]), None, None)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    results = {"flash": 2.10}   # measured default-shape dense step
    modes = () if args.teacache_only else ("sparse", "flash")
    for mode in modes:
        pipe = HunyuanVideoPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate, mode=mode)
        log(f"{mode}: warm-up (compiles)...")
        pipe(text, mask, seed=1, num_steps=1)
        log(f"{mode}: timed {args.steps} steps...")
        pipe(text, mask, seed=1)
        per_step = pipe.denoise_seconds / args.steps
        results[mode] = per_step
        log(f"{mode}: {per_step:.2f}s/step")
    if "sparse" in results:
        log(f"e2e speedup ({args.dual}+{args.single} blocks): "
            f"{results['flash'] / results['sparse']:.2f}x")

    if args.teacache:
        # +TeaCache tier: huge threshold forces every eligible mid step to
        # reuse the cached residual — measures the mechanism's best case
        # (real skip rates are data/threshold dependent)
        pipe = HunyuanVideoPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate, mode="sparse",
            enable_teacache=True, rel_l1_thresh=1e9)
        pipe(text, mask, seed=1, num_steps=1)
        steps = max(args.steps, 4)
        pipe(text, mask, seed=1, num_steps=steps)
        per_step = pipe.denoise_seconds / steps
        log(f"sparse+teacache: {per_step:.2f}s/step "
            f"(skipped {pipe.teacache_stats['skipped']}/{steps}); "
            f"vs dense: {results['flash'] / per_step:.2f}x")
    if "sparse" in results:
        full_sparse = results["sparse"] * 60 / (args.dual + args.single)
        full_dense = results["flash"] * 60 / (args.dual + args.single)
        log(f"extrapolated full 60-block model: dense {full_dense * 50:.0f}s,"
            f" sparse {full_sparse * 50:.0f}s for 50 steps")


if __name__ == "__main__":
    main()

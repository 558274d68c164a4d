"""Flux.1-dev 4096x4096 upscale-stage benchmark at full width.

Fourth-family E2E evidence (reference: main_upflux.py, sa_drop 0.9 →
1.60× sparse vs its torch dense at 4096²).  The 4096² stage is the
workload that matters: 65 536 visual tokens + 512 text.  Full width
(hidden 3072 / 24 heads), depth slice of the 19+38 model (12 B params
do not fit; per-step cost is linear in depth).

    python scripts/bench_e2e_flux.py --dual 4 --single 8 [--steps 2]
"""

import argparse
import time
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def flux_param_shapes(model, cfg, seed=0):
    rng = jax.random.PRNGKey(seed)
    text = jnp.zeros((1, 8, cfg.text_dim), jnp.float32)
    pooled = jnp.zeros((1, cfg.pooled_dim), jnp.float32)
    tokens = jnp.zeros((1, 64, cfg.in_channels))
    return jax.eval_shape(
        lambda r, tk, t, tx, p, g: model.init(r, tk, t, tx, p, g, 8, 8),
        rng, tokens, jnp.array([0.5]), text, pooled, jnp.array([3.5]))


def build_params(model, cfg, quant, scan, seed=0, scale=0.02):
    """Quantized runs generate the models/quant.py tree DIRECTLY
    (bench_e2e.host_quantized_tree); bf16 runs draw from a cyclic normal
    pool — both avoid hour-scale honest inits on this box's one core."""
    from bench_e2e import pool_normal_sampler, host_quantized_tree
    shapes = flux_param_shapes(model, cfg, seed)
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(shapes))
    log(f"{n/1e9:.2f}B params ({n*2/1e9:.1f} GB bf16)")
    if quant:
        from rectified_spaattn_tpu.models.quant import quantized_nbytes
        log(f"host-init DIRECT int{quant} tree...")
        p = host_quantized_tree(shapes, bits=quant, seed=seed)
        log(f"int{quant} weight-only: "
            f"{quantized_nbytes(p)/1e9:.1f} GB resident")
        return p
    draw = pool_normal_sampler(seed, scale)
    conv = (lambda x, d: x.astype(d)) if scan else jnp.asarray

    def leaf(sd):
        if not jnp.issubdtype(sd.dtype, jnp.floating):
            return conv(np.zeros(sd.shape), sd.dtype)
        return conv(draw(sd.shape), jnp.bfloat16)

    return jax.tree_util.tree_map(leaf, shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dual", type=int, default=4)
    ap.add_argument("--single", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--sa_drop_rate", type=float, default=0.9)
    ap.add_argument("--p_remain", type=float, default=0.05)
    ap.add_argument("--modes", type=str, default="sparse,flash")
    ap.add_argument("--teacache", action="store_true")
    ap.add_argument("--trace_out", type=str, default=None,
                    help="write the organic TeaCache schedule trace as "
                         "JSON (enabled after warm-up)")
    ap.add_argument("--scan_blocks", action="store_true",
                    help="lax.scan execution (one traced block per gate "
                         "segment) — required for full 19+38 depth")
    ap.add_argument("--quant", type=int, default=0, choices=(0, 4, 8),
                    help="weight-only quantization bits (models/quant.py);"
                         " 4 lets the full 12B model fit 16 GB")
    args = ap.parse_args()

    from rectified_spaattn_tpu.models.flux import FluxConfig, FluxDiT
    from rectified_spaattn_tpu.pipelines import FluxPipeline

    cfg = FluxConfig(num_dual_blocks=args.dual,
                     num_single_blocks=args.single)   # full width
    model = FluxDiT(cfg)
    log(f"host-init params (hidden {cfg.hidden_dim}, "
        f"{args.dual}+{args.single} blocks)...")
    params = build_params(model, cfg, args.quant, args.scan_blocks)

    depth = args.dual + args.single
    # At full depth, use the reference's REAL layer gate (dense band
    # [37, 57), rectified_flux_attn.py) instead of the all-sparse slice
    # approximation: the complete-model number needs no extrapolation
    # and no gate dilution argument.
    full_depth = (args.dual, args.single) == (19, 38)
    gate = FluxPipeline.sparse_layer_gate if full_depth \
        else (depth + 1, depth + 1)
    if full_depth:
        log("full 19+38 depth: reference layer gate [37,57) dense band")

    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 512, cfg.text_dim), jnp.float32)
    mask = jnp.ones((1, 512), bool)
    pooled = jax.random.normal(jax.random.fold_in(rng, 1),
                               (1, cfg.pooled_dim), jnp.float32)

    results = {}
    for mode in [m for m in args.modes.split(",") if m]:
        pipe = FluxPipeline(
            model=model, params=params, height=args.size, width=args.size,
            num_steps=args.steps, sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain, mode=mode,
            sparse_layer_gate=gate, scan_blocks=args.scan_blocks)
        params = pipe.params   # share ONE device copy across pipelines
        log(f"{mode}: warm-up (compiles)...")
        pipe(text, mask, pooled, seed=1, num_steps=1)
        log(f"{mode}: timed {args.steps} steps...")
        pipe(text, mask, pooled, seed=1)
        per_step = pipe.denoise_seconds / args.steps
        results[mode] = per_step
        log(f"{mode}: {per_step:.2f}s/step  (extrapolated full 57-block "
            f"28-step: {per_step * 57 / depth * 28:.0f}s)")
    if "sparse" in results and "flash" in results:
        log(f"Flux 4096^2 E2E dense->sparse speedup at {depth} blocks: "
            f"{results['flash'] / results['sparse']:.2f}x")

    if args.teacache:
        pipe = FluxPipeline(
            model=model, params=params, height=args.size, width=args.size,
            num_steps=args.steps, sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain, mode="sparse",
            sparse_layer_gate=gate, scan_blocks=args.scan_blocks,
            enable_teacache=True, rel_l1_thresh=0.8)
        pipe(text, mask, pooled, seed=1, num_steps=1)
        from rectified_spaattn_tpu.cache import teacache as tc_mod
        steps = max(args.steps, 6)
        with tc_mod.trace_to(args.trace_out):  # enabled AFTER the warm-up
            pipe(text, mask, pooled, seed=1, num_steps=steps)
        if args.trace_out:
            log(f"schedule trace -> {args.trace_out}")
        per_step = pipe.denoise_seconds / steps
        st = pipe.teacache_stats
        log(f"sparse+teacache: {per_step:.2f}s/step over {steps} steps "
            f"(skipped {st['skipped']}/{st['skipped'] + st['computed']})")
        if "sparse" in results and "flash" in results and st["skipped"]:
            t_c = results["sparse"]
            t_s = max((pipe.denoise_seconds - st["computed"] * t_c)
                      / st["skipped"], 0)
            # reference caching factor 4.15/1.60 -> ~61% step-skip
            for frac in (0.5, 0.61):
                t_step = (1 - frac) * t_c + frac * t_s
                log(f"at {frac:.0%} skip rate: {t_step:.2f}s/step -> "
                    f"{results['flash'] / t_step:.2f}x vs our dense")


if __name__ == "__main__":
    main()

"""CogVideoX1.5-5B end-to-end benchmark at FULL depth and width.

Third-family E2E evidence (reference: main_cogvideox.py, sa_drop 0.85 →
1.76× sparse vs its torch dense).  At 23 040 visual tokens the whole
42-block / hidden-3072 model fits one chip, so no depth slicing is needed
— this is the complete model.  DDIM + dynamic CFG (two transformer calls
per step).  sparse_warm_calls is zeroed for the timing window (the
reference keeps the first 5 of 50 steps dense — 10 % dilution at full
length, none in a 2-step probe).

    python scripts/bench_e2e_cog.py [--steps 2]
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


def host_bf16_params(model, cfg, seed=0, scale=0.02):
    rng = jax.random.PRNGKey(seed)
    text = jnp.zeros((1, 8, cfg.text_dim), jnp.float32)
    lat = jnp.zeros((1, cfg.in_channels, 2 * cfg.patch_size_t,
                     8 * cfg.patch_size, 8 * cfg.patch_size))
    shapes = jax.eval_shape(model.init, rng, lat, jnp.array([0.0]), text)
    g = np.random.default_rng(seed)

    def leaf(sd):
        if not jnp.issubdtype(sd.dtype, jnp.floating):
            return jnp.zeros(sd.shape, sd.dtype)
        return jnp.asarray(
            g.normal(size=sd.shape, scale=scale).astype(np.float32),
            jnp.bfloat16)

    return jax.tree_util.tree_map(leaf, shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frame", type=int, default=81)
    ap.add_argument("--sa_drop_rate", type=float, default=0.85)
    ap.add_argument("--p_remain", type=float, default=0.05)
    ap.add_argument("--modes", type=str, default="sparse,flash")
    ap.add_argument("--teacache", action="store_true")
    ap.add_argument("--trace_out", type=str, default=None,
                    help="write the organic TeaCache schedule trace as "
                         "JSON (enabled after warm-up)")
    ap.add_argument("--i2v", action="store_true",
                    help="I2V: image latents channel-concatenated into an "
                         "in_channels-32 model, ofs 2.0 "
                         "(reference: main_cogvideox.py:213-222)")
    args = ap.parse_args()

    from rectified_spaattn_tpu.models.cogvideox import (CogVideoXConfig,
                                                        CogVideoXDiT)
    from rectified_spaattn_tpu.pipelines import CogVideoXPipeline

    if args.i2v:
        cfg = CogVideoXConfig(in_channels=32)   # [noise 16 | image 16]
        args.sa_drop_rate = 0.75                # reference i2v default
    else:
        cfg = CogVideoXConfig()                  # the FULL 1.5-5B shape
    model = CogVideoXDiT(cfg)
    log(f"host-init bf16 params (hidden {cfg.hidden_dim}, "
        f"{cfg.num_blocks} blocks — full model)...")
    params = host_bf16_params(model, cfg)
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(params))
    log(f"{n/1e9:.2f}B params ({n*2/1e9:.1f} GB bf16)")

    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 226, cfg.text_dim), jnp.float32)
    neg = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, 226, cfg.text_dim), jnp.float32)

    condition = None
    if args.i2v:
        probe = CogVideoXPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate, mode="sparse")
        condition = jax.random.normal(
            jax.random.fold_in(rng, 3), (1, 16, *probe.grid), jnp.float32)
    results = {}
    for mode in [m for m in args.modes.split(",") if m]:
        pipe = CogVideoXPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain, mode=mode, sparse_warm_calls=0)
        log(f"{mode}: warm-up (compiles)...")
        pipe(text, neg, condition=condition, seed=1, num_steps=1)
        log(f"{mode}: timed {args.steps} steps (2 CFG calls each)...")
        pipe(text, neg, condition=condition, seed=1)
        per_step = pipe.denoise_seconds / args.steps
        results[mode] = per_step
        log(f"{mode}: {per_step:.2f}s/step  "
            f"(full 50-step denoise: {per_step * 50:.0f}s)")
    if "sparse" in results and "flash" in results:
        log(f"CogVideoX1.5{'-I2V' if args.i2v else ''} E2E dense->sparse "
            f"speedup (FULL model): "
            f"{results['flash'] / results['sparse']:.2f}x")

    if args.teacache:
        pipe = CogVideoXPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain, mode="sparse",
            sparse_warm_calls=0, enable_teacache=True, teacache_thresh=0.2)
        pipe(text, neg, condition=condition, seed=1, num_steps=1)
        from rectified_spaattn_tpu.cache import teacache as tc_mod
        steps = max(args.steps, 6)
        with tc_mod.trace_to(args.trace_out):  # enabled AFTER the warm-up
            pipe(text, neg, condition=condition, seed=1, num_steps=steps)
        if args.trace_out:
            log(f"schedule trace -> {args.trace_out}")
        per_step = pipe.denoise_seconds / steps
        st = pipe.teacache_stats
        log(f"sparse+teacache: {per_step:.2f}s/step over {steps} steps "
            f"(skipped {st['skipped']}/{st['skipped'] + st['computed']} "
            f"CFG calls)")
        if "sparse" in results and "flash" in results and st["skipped"]:
            t_call = results["sparse"] / 2
            t_skip = max((pipe.denoise_seconds
                          - st["computed"] * t_call) / st["skipped"], 0)
            # reference caching factor 2.97/1.76 -> ~57% call-skip
            for frac in (0.5, 0.57):
                t_step = 2 * ((1 - frac) * t_call + frac * t_skip)
                log(f"at {frac:.0%} call-skip rate: {t_step:.2f}s/step -> "
                    f"{results['flash'] / t_step:.2f}x vs our dense")


if __name__ == "__main__":
    main()

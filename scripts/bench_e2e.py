"""End-to-end transformer-step benchmark at HunyuanVideo scale.

Real token count (115 200 visual + 256 text), real width (3072 hidden /
24 heads), configurable depth — measures the practical dense→sparse
speedup of the full layer mix (attention + MLP + plan build +
rectification), not just the attention op.

Per-step cost is linear in depth (embed/head are <1% of a step at this
width), so the dense/sparse RATIO measured at --dual 6 --single 12 is the
full-model (20+40) ratio; the script also prints the extrapolated 50-step
full-depth wall-clock.  The full 13B-parameter model does not fit one
v5e's 16 GB HBM in bf16 — depth is the only axis scaled down.

    python scripts/bench_e2e.py --dual 6 --single 12 [--steps 3]
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


def pool_normal_sampler(seed: int, scale: float, pool_bits: int = 26):
    """Draw-from-a-cyclic-pool normal sampler: this box's single throttled
    core generates float64 normals at ~6M/s, which prices a 13B-param
    honest init at hours.  A 2^26 iid pool + cyclic windows with a prime
    stride keeps exact N(0, scale^2) marginals (cross-leaf correlations
    are irrelevant for timing benches; tests use real init)."""
    g = np.random.default_rng(seed)
    pool = g.normal(size=1 << pool_bits, scale=scale).astype(np.float32)
    P = pool.shape[0]
    off = [0]

    def draw(shape):
        n = int(np.prod(shape))
        s = off[0] % P
        off[0] += n + 9973
        if s + n <= P:
            seg = pool[s:s + n]
        else:
            seg = np.concatenate(
                [pool[s:]] + [pool] * ((s + n - P) // P) + [pool[:(s + n) % P]])
        return seg.reshape(shape)

    return draw


def host_quantized_tree(shapes, bits: int, scale=0.02, seed=0,
                        group_size=128, min_size=1 << 20):
    """Generate a weight-only-quantized param tree DIRECTLY in the
    models/quant.py layout (kernel_q/kernel_q4 + kernel_scale), skipping
    the bf16 build + quantize passes — on this box's throttled core the
    honest path prices a 13B tree at >1 h; cyclic byte-pool windows build
    it in minutes.  Timing-equivalent: uniform int4/int8 values with
    constant scales matched to the N(0, scale^2) std that quantizing a
    real random tree would produce."""
    from collections.abc import Mapping
    g = np.random.default_rng(seed)
    bpool = g.integers(0, 256, size=1 << 25, dtype=np.uint8)
    BP = bpool.shape[0]
    boff = [0]

    def draw_bytes(shape):
        n = int(np.prod(shape))
        s = boff[0] % BP
        boff[0] += n + 9973
        if s + n <= BP:
            seg = bpool[s:s + n].copy()
        else:
            seg = np.concatenate(
                [bpool[s:]] + [bpool] * ((s + n - BP) // BP)
                + [bpool[:(s + n) % BP]])
        return seg.reshape(shape)

    # bf16 residue (embeds/norms/biases) is small — a 4M pool suffices
    fdraw = pool_normal_sampler(seed + 1, scale, pool_bits=22)

    def leaf(sd):
        if not jnp.issubdtype(sd.dtype, jnp.floating):
            return np.zeros(sd.shape, np.dtype(sd.dtype))
        return fdraw(sd.shape).astype(jnp.bfloat16)

    def walk(tree):
        if not isinstance(tree, Mapping):
            return leaf(tree)
        k = tree.get("kernel")
        if (k is not None and hasattr(k, "ndim") and k.ndim >= 2
                and int(np.prod(k.shape)) >= min_size
                and k.shape[-2] % 2 == 0):
            *lead, din, dout = k.shape
            out = {}
            if bits == 8:
                # uniform int8 std 73.9 -> scale matches N(0, scale^2)
                out["kernel_q"] = draw_bytes(k.shape).view(np.int8)
                out["kernel_scale"] = np.full((*lead, dout),
                                              scale / 73.9, np.float32)
            else:
                # two uniform nibbles/byte, signed [-8, 7], std 4.61
                out["kernel_q4"] = draw_bytes((*lead, din // 2, dout))
                out["kernel_scale"] = np.full(
                    (*lead, din // min(group_size, din), dout),
                    scale / 4.61, np.float32)
            out.update({n: leaf(v) for n, v in tree.items()
                        if n != "kernel"})
            return out
        return {n: walk(v) for n, v in tree.items()}

    return walk(shapes)


def param_shapes(model, cfg, text_dim, seed=0):
    rng = jax.random.PRNGKey(seed)
    text = jnp.zeros((1, 8, text_dim), jnp.float32)
    mask = jnp.ones((1, 8), bool)
    lat = jnp.zeros((1, cfg.in_channels, 2 * cfg.patch_size_t,
                     8 * cfg.patch_size, 8 * cfg.patch_size))
    return jax.eval_shape(model.init, rng, lat, jnp.array([0.0]), text,
                          mask, jnp.array([6000.0]), None, None)


def host_bf16_params(model, cfg, text_dim, scale=0.02, seed=0, host=False):
    """Random bf16 params built leaf-by-leaf on the host: a full fp32
    device init would need 2x the bf16 footprint and blows HBM at real
    width×depth.  host=True keeps leaves as numpy (for quantize_params /
    stack_block_params before any device transfer)."""
    shapes = param_shapes(model, cfg, text_dim, seed)
    draw = pool_normal_sampler(seed, scale)
    conv = (lambda x, d: x.astype(d)) if host else jnp.asarray

    def leaf(sd):
        if not jnp.issubdtype(sd.dtype, jnp.floating):
            return conv(np.zeros(sd.shape), sd.dtype)
        return conv(draw(sd.shape), jnp.bfloat16)

    return jax.tree_util.tree_map(leaf, shapes)


def smooth_latents(cfg, t, hh, ww, seed=1):
    """Spatially low-pass initial latents: real denoising trajectories are
    smooth, which is what makes pooled attention statistics peaked."""
    k = jax.random.PRNGKey(seed)
    coarse = jax.random.normal(
        k, (1, cfg.in_channels, max(2, t // 2), max(2, hh // 4),
            max(2, ww // 4)), jnp.float32)
    f = jax.image.resize(coarse, (1, cfg.in_channels, t, hh, ww), "linear")
    fine = 0.5 * jax.random.normal(jax.random.fold_in(k, 1), f.shape)
    return f + fine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dual", type=int, default=6)
    ap.add_argument("--single", type=int, default=12)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frame", type=int, default=128)
    ap.add_argument("--sa_drop_rate", type=float, default=0.8)
    ap.add_argument("--hidden", type=int, default=3072)
    ap.add_argument("--modes", type=str, default="sparse,flash")
    ap.add_argument("--p_remain", type=float, default=0.3,
                    help="top-p mass threshold; random weights spread the "
                         "pooled mass, so 0.3 over-selects vs real "
                         "checkpoints — 0.05 pins counts to the top-k "
                         "floor (the reference's real-data regime)")
    ap.add_argument("--teacache", action="store_true",
                    help="also time the sparse+TeaCache tier")
    ap.add_argument("--teacache_thresh", type=float, default=0.15)
    ap.add_argument("--teacache_residual", type=str, default="bf16",
                    choices=("bf16", "int8"),
                    help="residual encode (int8 halves both the "
                         "persistent previous_residual and the "
                         "want_residual output buffer — the full-depth "
                         "organic-run HBM lever)")
    ap.add_argument("--teacache_offload", action="store_true",
                    help="keep previous_residual on the host between "
                         "steps (frees its HBM; one transfer per call)")
    ap.add_argument("--replay_trace", type=str, default=None,
                    help="REPLAY a recorded TeaCache schedule "
                         "(cache.schedule_from_trace) instead of "
                         "deciding from the signal — measures the "
                         "+TeaCache tier at an exact published regime")
    ap.add_argument("--density", action="store_true",
                    help="log the executed mask density of every sparse "
                         "call (one scalar callback per call; printed "
                         "next to s/step)")
    ap.add_argument("--tea_steps", type=int, default=0,
                    help="steps for the TeaCache organic run (default "
                         "max(--steps, 6)); lets a 50-step organic "
                         "schedule run without the sparse/flash modes "
                         "paying 50 timed steps")
    ap.add_argument("--trace_out", type=str, default=None,
                    help="write the organic TeaCache schedule trace "
                         "(raw rel-L1 signals + decisions) as JSON, for "
                         "replay through the reference's decision code")
    ap.add_argument("--dense_ref", type=float, default=None,
                    help="dense s/step from a prior run (for the "
                         "teacache-only process)")
    ap.add_argument("--scan_blocks", action="store_true",
                    help="lax.scan execution (one traced block per stream "
                         "type) — required for full 20+40 depth")
    ap.add_argument("--mlp_chunk", type=int, default=1,
                    help="FFN sequence chunking (peak-HBM lever, "
                         "layers.MLP.chunk; identical math)")
    ap.add_argument("--quant", type=int, default=0, choices=(0, 4, 8),
                    help="weight-only quantization bits (models/quant.py);"
                         " 8 or 4 lets the full 13B flagship fit 16 GB")
    ap.add_argument("--group_rows", type=int, default=1,
                    help="grouped-row kernel execution "
                         "(SparseConfig.group_rows; 2 measured faster "
                         "than single-row at the Hunyuan point)")
    ap.add_argument("--head_chunk", type=int, default=0,
                    help="head-tiled attention execution "
                         "(SparseConfig.head_chunk) — peak-HBM lever")
    ap.add_argument("--kv_pack", action="store_true",
                    help="producer-packed KV (SparseConfig.kv_pack): "
                         "kills the kernel's own packed [K|V] copy "
                         "(~1.5 GB at the 115k point) — peak-HBM lever")
    ap.add_argument("--plan_row_chunk", type=int, default=0,
                    help="row-tile the plan build (memory lever)")
    ap.add_argument("--signal_stride", type=int, default=1,
                    help="TeaCache signal token stride (memory lever for "
                         "full-depth organic runs; rel-L1 is a mean, a "
                         "stride moves it O(1e-3) relative)")
    ap.add_argument("--dispatch_segments", type=int, default=1,
                    help="split each phase's block scan into N dispatches "
                         "per step — required when a single dispatch "
                         "would exceed the tunnel's ~60s execution "
                         "watchdog (full-depth dense: ~87s)")
    args = ap.parse_args()

    from rectified_spaattn_tpu.models.hunyuan import (
        HunyuanVideoConfig, HunyuanVideoDiT)
    from rectified_spaattn_tpu.pipelines import HunyuanVideoPipeline

    cfg = HunyuanVideoConfig(
        hidden_dim=args.hidden, heads=args.hidden // 128,
        num_dual_blocks=args.dual, num_single_blocks=args.single,
        text_dim=1024, pooled_dim=256, num_refiner_blocks=1,
        mlp_chunk=args.mlp_chunk)
    model = HunyuanVideoDiT(cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.
                   tree_leaves(param_shapes(model, cfg, cfg.text_dim)))
    log(f"{n_params/1e9:.2f}B params "
        f"({n_params*2/1e9:.1f} GB bf16)")
    if args.quant:
        from rectified_spaattn_tpu.models.quant import quantized_nbytes
        log(f"host-init DIRECT int{args.quant} tree (hidden "
            f"{cfg.hidden_dim}, {args.dual}+{args.single} blocks)...")
        params = host_quantized_tree(
            param_shapes(model, cfg, cfg.text_dim), bits=args.quant)
        log(f"int{args.quant} weight-only: "
            f"{quantized_nbytes(params)/1e9:.1f} GB resident")
    else:
        log(f"host-init bf16 params (hidden {cfg.hidden_dim}, "
            f"{args.dual}+{args.single} blocks)...")
        params = host_bf16_params(model, cfg, cfg.text_dim,
                                  host=args.scan_blocks)

    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 256, cfg.text_dim), jnp.float32)
    mask = jnp.zeros((1, 256), bool).at[:, :40].set(True)

    # smooth initial latents -> peaked pooled attention (the regime real
    # checkpoints operate in); density is data-dependent, so it is
    # measured and reported rather than assumed
    t_lat = (args.frame - 1) // 4 + 1
    hh, ww = args.height // 8, args.width // 8
    init_latents = smooth_latents(cfg, t_lat, hh, ww)

    def log_density(pipe, tag):
        samples = getattr(pipe, "density_samples", [])
        if samples:
            a = np.asarray(samples)
            log(f"{tag}: executed mask density mean {a.mean():.4f} "
                f"(min {a.min():.4f}, max {a.max():.4f}, "
                f"{len(a)} probed steps)")

    results = {}
    depth = args.dual + args.single
    for mode in [m for m in args.modes.split(",") if m]:
        pipe = HunyuanVideoPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain, mode=mode,
            scan_blocks=args.scan_blocks,
            dispatch_segments=args.dispatch_segments,
            plan_row_chunk=args.plan_row_chunk,
            kv_pack=args.kv_pack,
                head_chunk=args.head_chunk,
            group_rows=args.group_rows,
            teacache_signal_stride=args.signal_stride,
            density_probe=args.density and mode == "sparse")
        params = pipe.params   # share ONE device copy across pipelines
        log(f"{mode}: warm-up (compiles)...")
        pipe(text, mask, seed=1, num_steps=1, init_latents=init_latents)
        log(f"{mode}: timed {args.steps} steps...")
        pipe(text, mask, seed=1, init_latents=init_latents)
        per_step = pipe.denoise_seconds / args.steps
        results[mode] = per_step
        log(f"{mode}: {per_step:.2f}s/step  "
            f"(extrapolated full 60-block 50-step: "
            f"{per_step * 60 / depth * 50:.0f}s)")
        log_density(pipe, mode)
    if "sparse" in results and "flash" in results:
        log(f"E2E dense->sparse speedup at {args.dual}+{args.single} blocks"
            f" (ratio is depth-invariant): "
            f"{results['flash'] / results['sparse']:.2f}x")

    if args.teacache or args.replay_trace:
        schedule = None
        if args.replay_trace:
            from rectified_spaattn_tpu.cache import schedule_from_trace
            schedule = schedule_from_trace(args.replay_trace)
            log(f"replaying recorded schedule: {sum(schedule)} compute / "
                f"{len(schedule) - sum(schedule)} skip calls "
                f"({args.replay_trace})")
        pipe = HunyuanVideoPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain, mode="sparse",
            enable_teacache=args.teacache,
            rel_l1_thresh=args.teacache_thresh,
            scan_blocks=args.scan_blocks,
            dispatch_segments=args.dispatch_segments,
            plan_row_chunk=args.plan_row_chunk,
            kv_pack=args.kv_pack,
                head_chunk=args.head_chunk,
            group_rows=args.group_rows,
            teacache_signal_stride=args.signal_stride,
            teacache_residual=args.teacache_residual,
            teacache_offload=args.teacache_offload,
            teacache_schedule=schedule,
            density_probe=args.density)
        params = pipe.params
        # warm-up compiles BOTH branches (compute + apply_residual) so the
        # timed run's first skip doesn't carry a remote compile
        pipe.teacache_schedule = [True, False]
        pipe(text, mask, seed=1, num_steps=2, init_latents=init_latents)
        pipe.teacache_schedule = schedule
        from rectified_spaattn_tpu.cache import teacache as tc_mod
        steps = args.tea_steps or max(args.steps, 6)
        with tc_mod.trace_to(args.trace_out):  # enabled AFTER the warm-up
            pipe(text, mask, seed=1, num_steps=steps,
                 init_latents=init_latents)
        if args.trace_out:
            log(f"schedule trace -> {args.trace_out}")
        per_step = pipe.denoise_seconds / steps
        st = pipe.teacache_stats
        skipped, computed = st["skipped"], st["computed"]
        tag = ("replay" if schedule is not None
               else f"thresh={args.teacache_thresh}")
        log(f"sparse+teacache({tag}, residual={args.teacache_residual}"
            f"{', offload' if args.teacache_offload else ''}): "
            f"{per_step:.2f}s/step over {steps} steps "
            f"(skipped {skipped}/{skipped+computed})")
        log_density(pipe, "teacache")
        if args.dense_ref is not None:
            results.setdefault("flash", args.dense_ref)
        if skipped:
            # skip-step cost from the mix: total = c*t_c + s*t_s
            t_c = results.get("sparse", per_step * (skipped + computed)
                              / max(computed, 1))
            t_s = max((pipe.denoise_seconds - computed * t_c) / skipped, 0)
            log(f"per-step: compute {t_c:.2f}s, skip {t_s:.2f}s")
            dense = results.get("flash")
            for frac in (0.5, 0.54):
                t_tea = (1 - frac) * t_c + frac * t_s
                msg = (f"at {frac:.0%} skip rate (reference Hunyuan "
                       f"regime): {t_tea:.2f}s/step")
                if dense is not None and "sparse" in results:
                    # only compare when dense was measured at THIS depth
                    msg += f" -> {dense / t_tea:.2f}x vs our dense"
                log(msg)


if __name__ == "__main__":
    main()

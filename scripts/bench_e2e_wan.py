"""Wan2.1-T2V end-to-end benchmark at full width (hidden 5120 / 40 heads).

Second-family E2E evidence (reference: main_wan21t2v.py, sa_drop 0.75 →
1.68× sparse / 4.61× +TeaCache vs its torch dense).  Same methodology as
bench_e2e.py: full 720p·81f token count (75 600 visual + 512 cross-attn
text), bf16 host-initialised params, configurable depth slice (per-step
cost linear in depth), UniPC + CFG (two transformer calls per step).

warm_layers/warm_calls are zeroed for the timing slice: the reference
keeps 2 of 40 layers + the first 10 calls dense, which at an 8-block
slice would overweight the dense share 5x; the dilution at full depth is
<3 % of the ratio.

    python scripts/bench_e2e_wan.py --blocks 8 [--steps 2]
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


def wan_param_shapes(model, cfg, seed=0):
    rng = jax.random.PRNGKey(seed)
    text = jnp.zeros((1, 8, cfg.text_dim), jnp.float32)
    lat = jnp.zeros((1, cfg.in_channels, 2 * cfg.patch_size[0],
                     8 * cfg.patch_size[1], 8 * cfg.patch_size[2]))
    img = (jnp.zeros((1, 257, cfg.image_dim), jnp.float32)
           if cfg.image_cross else None)
    return jax.eval_shape(
        lambda r, l, t, tx: model.init(r, l, t, tx, img),
        rng, lat, jnp.array([0.0]), text)


def host_bf16_params(model, cfg, seed=0, scale=0.02, host=False):
    """host=True keeps leaves as numpy (for quantize_params /
    stack_block_params before any device transfer)."""
    from bench_e2e import pool_normal_sampler
    shapes = wan_param_shapes(model, cfg, seed)
    draw = pool_normal_sampler(seed, scale)
    conv = (lambda x, d: x.astype(d)) if host else jnp.asarray

    def leaf(sd):
        if not jnp.issubdtype(sd.dtype, jnp.floating):
            return conv(np.zeros(sd.shape), sd.dtype)
        return conv(draw(sd.shape), jnp.bfloat16)

    return jax.tree_util.tree_map(leaf, shapes)


def build_params(model, cfg, quant, scan, seed=0):
    """Quantized runs generate the models/quant.py tree DIRECTLY
    (bench_e2e.host_quantized_tree) — the bf16-build + quantize passes
    price a 14B tree in tens of minutes on this box's one core."""
    shapes = wan_param_shapes(model, cfg, seed)
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(shapes))
    log(f"{n/1e9:.2f}B params ({n*2/1e9:.1f} GB bf16)")
    if quant:
        from bench_e2e import host_quantized_tree
        from rectified_spaattn_tpu.models.quant import quantized_nbytes
        log(f"host-init DIRECT int{quant} tree...")
        p = host_quantized_tree(shapes, bits=quant, seed=seed)
        log(f"int{quant} weight-only: "
            f"{quantized_nbytes(p)/1e9:.1f} GB resident")
        return p
    return host_bf16_params(model, cfg, seed=seed, host=scan)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frame", type=int, default=81)
    ap.add_argument("--sa_drop_rate", type=float, default=0.75)
    ap.add_argument("--p_remain", type=float, default=0.05)
    ap.add_argument("--modes", type=str, default="sparse,flash")
    ap.add_argument("--trace_out", type=str, default=None,
                    help="write the organic TeaCache schedule trace as "
                         "JSON (enabled after warm-up)")
    ap.add_argument("--teacache", action="store_true",
                    help="also time sparse+TeaCache (CFG dual-state, "
                         "use_ret_steps, reference thresh 0.2)")
    ap.add_argument("--teacache_residual", type=str, default="bf16",
                    choices=("bf16", "int8"),
                    help="residual encode (int8 halves the residual "
                         "buffers; cache/teacache.py::residual_value)")
    ap.add_argument("--teacache_offload", action="store_true",
                    help="keep previous_residual on the host between "
                         "steps (frees its HBM; one transfer per call)")
    ap.add_argument("--replay_trace", type=str, default=None,
                    help="REPLAY a recorded TeaCache schedule "
                         "(cache.schedule_from_trace) instead of deciding "
                         "from the signal — executes the calibrated "
                         "published-regime schedule at full depth and "
                         "times it (VERDICT r4 #1b)")
    ap.add_argument("--density", action="store_true",
                    help="log the executed mask density of every sparse "
                         "call (printed next to s/step)")
    ap.add_argument("--a14b", action="store_true",
                    help="Wan2.2 T2V-A14B dual-transformer routing: two "
                         "full-width models, high/low-noise split by "
                         "boundary_ratio (reference: main_wan22t2v.py)")
    ap.add_argument("--i2v", action="store_true",
                    help="Wan2.1-I2V: in_channels-36 conditioned latents "
                         "(VAE first frame + mask4) + CLIP image "
                         "cross-attention (reference: main_wan21i2v.py)")
    ap.add_argument("--ti2v", action="store_true",
                    help="Wan2.2 TI2V-5B shape: hidden 3072/24 heads, 30 "
                         "blocks (the COMPLETE model fits one chip), "
                         "48-ch latents, VAE stride 32, 704x1280x121f")
    ap.add_argument("--scan_blocks", action="store_true",
                    help="lax.scan execution (one traced block per "
                         "attention gate) — required for full 40-block "
                         "depth")
    ap.add_argument("--group_rows", type=int, default=1,
                    help="grouped-row kernel execution "
                         "(SparseConfig.group_rows)")
    ap.add_argument("--plan_row_chunk", type=int, default=0,
                    help="row-tile the sparse-plan build + rectification "
                         "apply (SparseConfig.plan_row_chunk) — bounds "
                         "the fp32 plan temps (peak-HBM lever; the 16.4B "
                         "conditioned I2V tree still exceeds the "
                         "single-chip budget at full depth even with it, "
                         "logs/r4_wani2v_full.log)")
    ap.add_argument("--head_chunk", type=int, default=0,
                    help="head-tiled attention execution "
                         "(SparseConfig.head_chunk) — peak-HBM lever")
    ap.add_argument("--kv_pack", action="store_true",
                    help="producer-packed KV (SparseConfig.kv_pack): "
                         "kills the kernel's own packed [K|V] copy "
                         "(~1.5 GB at 75.6k tokens) — peak-HBM lever")
    ap.add_argument("--mlp_chunk", type=int, default=1,
                    help="FFN sequence chunking (peak-HBM lever, "
                         "layers.MLP.chunk; identical math)")
    ap.add_argument("--quant", type=int, default=0, choices=(0, 4, 8),
                    help="weight-only quantization bits (models/quant.py);"
                         " 4 lets the full 14B model fit 16 GB")
    ap.add_argument("--signal_scale", type=float, default=1.0,
                    help="TeaCache raw-signal multiplier from "
                         "scripts/calibrate_teacache.py (random-weight "
                         "organic runs; wan21-t2v ret: 0.0979)")
    ap.add_argument("--tea_steps", type=int, default=0,
                    help="steps for the TeaCache organic run (default "
                         "max(--steps, 6))")
    ap.add_argument("--dispatch_segments", type=int, default=1,
                    help="split each gate segment's scan into N "
                         "dispatches per CFG call (the full-depth dense "
                         "call is ~62 s, past the tunnel's ~60 s "
                         "watchdog)")
    ap.add_argument("--share_tree", action="store_true",
                    help="A14B: both transformers share ONE device weight "
                         "tree — cost-identical timing (same arch, same "
                         "compute) but output values are not meaningful; "
                         "superseded by --host_swap (a real two-tree "
                         "configuration)")
    ap.add_argument("--host_swap", action="store_true",
                    help="A14B: keep BOTH trees in host RAM and swap the "
                         "low-noise tree onto the chip once at the "
                         "boundary step (routing is sequential) — a real "
                         "two-transformer serving configuration; the "
                         "measured swap seconds amortize over the "
                         "low-noise steps (VERDICT r4 #4)")
    args = ap.parse_args()

    from rectified_spaattn_tpu.models.wan import WanConfig, WanDiT
    from rectified_spaattn_tpu.pipelines import WanPipeline

    if args.ti2v:
        cfg = WanConfig(in_channels=48, out_channels=48, hidden_dim=3072,
                        heads=24, head_dim=128, num_blocks=args.blocks,
                        ffn_dim=14336, mlp_chunk=args.mlp_chunk)
        args.height, args.width, args.frame = 704, 1280, 121
        vae_stride = (4, 32, 32)
    elif args.a14b and args.i2v:
        # Wan2.2 I2V-A14B: conditioned latents, NO CLIP image branch
        # (reference: main_wan22i2v.py uses WanImageToVideoPipeline)
        cfg = WanConfig(in_channels=36, num_blocks=args.blocks,
                        mlp_chunk=args.mlp_chunk)
        vae_stride = (4, 16, 16)
    elif args.i2v:
        cfg = WanConfig(in_channels=36, num_blocks=args.blocks,
                        image_cross=True, mlp_chunk=args.mlp_chunk)
        vae_stride = (4, 16, 16)
    else:
        cfg = WanConfig(num_blocks=args.blocks,   # full width, sliced depth
                        mlp_chunk=args.mlp_chunk)
        vae_stride = (4, 16, 16)
    model = WanDiT(cfg)
    log(f"host-init params (hidden {cfg.hidden_dim}, "
        f"{args.blocks} blocks)...")
    params = build_params(model, cfg, args.quant, args.scan_blocks)

    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 512, cfg.text_dim), jnp.float32)
    neg = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, 512, cfg.text_dim), jnp.float32)

    if args.a14b:
        from rectified_spaattn_tpu.pipelines import Wan22A14BPipeline
        if args.share_tree:
            log("low-noise transformer SHARES the high-noise tree "
                "(timing-only run)")
            params2 = params
        else:
            log("host-init second (low-noise) transformer...")
            params2 = build_params(model, cfg, args.quant,
                                   args.scan_blocks, seed=1)
        if args.host_swap:
            log("host_swap: both trees stay in host RAM; the low tree "
                "transfers once at the boundary step")
        results = {}
        for mode in [m for m in args.modes.split(",") if m]:
            mk = lambda p_: WanPipeline(
                model=model, params=p_, height=args.height,
                width=args.width, frames=args.frame, num_steps=args.steps,
                sa_drop_rate=args.sa_drop_rate,
                p_remain_rates=args.p_remain, mode=mode,
                warm_layers=0, warm_calls=0, vae_stride=vae_stride,
                scan_blocks=args.scan_blocks,
                dispatch_segments=args.dispatch_segments,
                group_rows=args.group_rows,
                plan_row_chunk=args.plan_row_chunk,
                kv_pack=args.kv_pack,
                head_chunk=args.head_chunk,
                defer_device=args.host_swap)
            high = mk(params)
            params = high.params        # ONE device copy across modes
            if args.share_tree:
                params2 = params        # pre-stacked device tree: no copy
            pipe = Wan22A14BPipeline(high=high, low=mk(params2),
                                     host_swap=args.host_swap)
            params2 = pipe.low.params
            cond = None
            noise_ch = cfg.in_channels
            if args.i2v:
                cond = jax.random.normal(
                    jax.random.fold_in(rng, 4), (1, 20, *pipe.high.grid),
                    jnp.float32)      # [mask4 | VAE first-frame latents]
                noise_ch = cfg.in_channels - 20
            lat = jax.random.normal(
                jax.random.PRNGKey(1),
                (1, noise_ch, *pipe.high.grid), jnp.float32)
            # steps >= 8 so BOTH transformers execute (boundary 0.875
            # puts the split at ~1/8 of the schedule); warm-up must run
            # the full schedule so the low-noise programs compile too
            steps = max(args.steps, 8)
            log(f"{mode}: warm-up (compiles both transformers)...")
            pipe.denoise(lat, text, neg, condition=cond, num_steps=steps)
            log(f"{mode}: timed {steps} steps (dual-transformer routed)...")
            pipe.denoise(lat, text, neg, condition=cond, num_steps=steps)
            per_step = pipe.denoise_seconds / steps
            results[mode] = per_step
            if args.host_swap:
                sw = pipe.swap_seconds
                log(f"{mode}: boundary tree swap {sw:.2f}s "
                    f"(initial high-tree load "
                    f"{getattr(pipe, 'load_seconds', 0):.2f}s); "
                    f"{per_step:.2f}s/step incl. swap, "
                    f"{(pipe.denoise_seconds - sw) / steps:.2f}s/step "
                    f"excl.")
            else:
                log(f"{mode}: {per_step:.2f}s/step")
        if "sparse" in results and "flash" in results:
            kind = "I2V" if args.i2v else "T2V"
            log(f"Wan2.2 {kind}-A14B E2E dense->sparse speedup: "
                f"{results['flash'] / results['sparse']:.2f}x")
        if args.teacache or args.replay_trace:
            thresh = 0.3 if args.i2v else 0.2
            schedule = None
            tea_steps = max(args.tea_steps or args.steps, 8)
            if args.replay_trace:
                # A14B traces are JOINT: both transformers' CFG calls in
                # chronological order (routing is sequential), so the
                # first high_steps*2 entries belong to the high-noise
                # TeaCache stream and the rest to the low-noise one
                from rectified_spaattn_tpu.cache import schedule_from_trace
                schedule = schedule_from_trace(args.replay_trace)
                tea_steps = len(schedule) // 2
                log(f"replaying recorded A14B schedule: {sum(schedule)} "
                    f"compute / {len(schedule) - sum(schedule)} skip CFG "
                    f"calls over {tea_steps} steps ({args.replay_trace})")
            mk_t = lambda p_: WanPipeline(
                model=model, params=p_, height=args.height,
                width=args.width, frames=args.frame, num_steps=args.steps,
                sa_drop_rate=args.sa_drop_rate,
                p_remain_rates=args.p_remain, mode="sparse",
                warm_layers=0, warm_calls=0, vae_stride=vae_stride,
                enable_teacache=args.teacache, teacache_thresh=thresh,
                scan_blocks=args.scan_blocks,
                dispatch_segments=args.dispatch_segments,
                group_rows=args.group_rows,
                plan_row_chunk=args.plan_row_chunk,
                kv_pack=args.kv_pack,
                head_chunk=args.head_chunk,
                teacache_residual=args.teacache_residual,
                teacache_offload=args.teacache_offload,
                defer_device=args.host_swap)
            high = mk_t(params)
            if not args.host_swap:
                params = high.params
            pipe = Wan22A14BPipeline(
                high=high,
                low=mk_t(high.params if args.share_tree else params2),
                host_swap=args.host_swap)
            cond = None
            noise_ch = cfg.in_channels
            if args.i2v:
                cond = jax.random.normal(
                    jax.random.fold_in(rng, 4), (1, 20, *pipe.high.grid),
                    jnp.float32)
                noise_ch = cfg.in_channels - 20
            lat = jax.random.normal(
                jax.random.PRNGKey(1),
                (1, noise_ch, *pipe.high.grid), jnp.float32)
            if schedule is not None:
                # split the joint schedule at the boundary step
                sched_obj = pipe.high._scheduler(tea_steps)
                boundary = pipe.boundary_ratio * pipe.num_train_timesteps
                high_steps = int(np.sum(
                    np.asarray(sched_obj.timesteps) >= boundary))
                log(f"boundary split: {high_steps} high-noise steps "
                    f"({sum(schedule[:high_steps * 2])} computed) / "
                    f"{tea_steps - high_steps} low-noise "
                    f"({sum(schedule[high_steps * 2:])} computed)")
            # warm-up compiles BOTH transformers' compute branches and
            # the skip (apply_residual) branch; 8 steps puts >=1 step on
            # the high-noise side at boundary 0.875
            warm_steps = min(tea_steps, 8)
            pipe.high.teacache_schedule = [True, True]
            pipe.low.teacache_schedule = [True, True, False, False]
            log("teacache: warm-up (compiles both transformers)...")
            pipe.denoise(lat, text, neg, condition=cond,
                         num_steps=warm_steps)
            if schedule is not None:
                pipe.high.teacache_schedule = schedule[:high_steps * 2]
                pipe.low.teacache_schedule = schedule[high_steps * 2:]
            else:
                pipe.high.teacache_schedule = None
                pipe.low.teacache_schedule = None
            from rectified_spaattn_tpu.cache import teacache as tc_mod
            with tc_mod.trace_to(args.trace_out) as trace:
                pipe.denoise(lat, text, neg, condition=cond,
                             num_steps=tea_steps)
            per_step = pipe.denoise_seconds / tea_steps
            if trace is not None:
                calls = [r for r in trace if "call" in r]
                skipped = sum(not r["compute"] for r in calls)
                log(f"schedule trace -> {args.trace_out} "
                    f"(skipped {skipped}/{len(calls)} CFG calls across "
                    f"both transformers)")
            st = pipe.teacache_stats
            tag = "replay" if schedule is not None else f"thresh={thresh}"
            skipped = (st["high"]["skipped"] + st["low"]["skipped"])
            computed = (st["high"]["computed"] + st["low"]["computed"])
            extra = ""
            if args.host_swap:
                extra = (f"; boundary swap {pipe.swap_seconds:.2f}s, "
                         f"excl. {(pipe.denoise_seconds - pipe.swap_seconds) / tea_steps:.2f}s/step")
            log(f"sparse+teacache({tag}, residual="
                f"{args.teacache_residual}, A14B dual streams x2): "
                f"{per_step:.2f}s/step over {tea_steps} steps "
                f"(skipped {skipped}/{skipped + computed} CFG calls"
                f"{extra})")
        return

    image_emb = None
    condition = None
    if args.i2v:
        image_emb = jax.random.normal(jax.random.fold_in(rng, 2),
                                      (1, 257, cfg.image_dim), jnp.float32)
        probe = WanPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate, mode="sparse",
            vae_stride=vae_stride)
        lt_, lh_, lw_ = probe.grid
        condition = jax.random.normal(
            jax.random.fold_in(rng, 3), (1, 20, lt_, lh_, lw_),
            jnp.float32)    # [mask4 | VAE first-frame latents 16]

    def log_density(pipe, tag):
        samples = getattr(pipe, "density_samples", [])
        if samples:
            a = np.asarray(samples)
            log(f"{tag}: executed mask density mean {a.mean():.4f} "
                f"(min {a.min():.4f}, max {a.max():.4f}, "
                f"{len(a)} probed CFG calls)")

    results = {}
    for mode in [m for m in args.modes.split(",") if m]:
        pipe = WanPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain, mode=mode,
            warm_layers=0, warm_calls=0, vae_stride=vae_stride,
            scan_blocks=args.scan_blocks,
                dispatch_segments=args.dispatch_segments,
                group_rows=args.group_rows,
                plan_row_chunk=args.plan_row_chunk,
                kv_pack=args.kv_pack,
                head_chunk=args.head_chunk,
                density_probe=args.density and mode == "sparse")
        params = pipe.params   # share ONE device copy across pipelines
        log(f"{mode}: warm-up (compiles)...")
        pipe(text, neg, image_emb=image_emb, condition=condition,
             seed=1, num_steps=1)
        log(f"{mode}: timed {args.steps} steps (2 CFG calls each)...")
        pipe(text, neg, image_emb=image_emb, condition=condition, seed=1)
        per_step = pipe.denoise_seconds / args.steps
        results[mode] = per_step
        log_density(pipe, mode)
        full_blocks = 30 if args.ti2v else 40
        log(f"{mode}: {per_step:.2f}s/step  (extrapolated full "
            f"{full_blocks}-block 50-step: "
            f"{per_step * full_blocks / args.blocks * 50:.0f}s)")
    if "sparse" in results and "flash" in results:
        log(f"Wan E2E dense->sparse speedup at {args.blocks} blocks:"
            f" {results['flash'] / results['sparse']:.2f}x")

    if args.teacache or args.replay_trace:
        schedule = None
        if args.replay_trace:
            from rectified_spaattn_tpu.cache import schedule_from_trace
            schedule = schedule_from_trace(args.replay_trace)
            log(f"replaying recorded schedule: {sum(schedule)} compute / "
                f"{len(schedule) - sum(schedule)} skip CFG calls "
                f"({args.replay_trace})")
        pipe = WanPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain, mode="sparse",
            warm_layers=0, warm_calls=0, vae_stride=vae_stride,
            enable_teacache=args.teacache, teacache_thresh=0.2,
            use_ret_steps=True,
            teacache_signal_scale=args.signal_scale,
            scan_blocks=args.scan_blocks,
                dispatch_segments=args.dispatch_segments,
                group_rows=args.group_rows,
                plan_row_chunk=args.plan_row_chunk,
                kv_pack=args.kv_pack,
                head_chunk=args.head_chunk,
                teacache_residual=args.teacache_residual,
                teacache_offload=args.teacache_offload,
                teacache_schedule=schedule,
                density_probe=args.density)
        params = pipe.params
        # warm-up compiles BOTH branches (compute + apply_residual) so
        # the timed run's first skip doesn't carry a remote compile
        pipe.teacache_schedule = [True, True, False, False]
        pipe(text, neg, image_emb=image_emb, condition=condition,
             seed=1, num_steps=2)
        pipe.teacache_schedule = schedule
        from rectified_spaattn_tpu.cache import teacache as tc_mod
        steps = args.tea_steps or max(args.steps, 6)
        with tc_mod.trace_to(args.trace_out):  # enabled AFTER the warm-up
            pipe(text, neg, image_emb=image_emb, condition=condition,
                 seed=1, num_steps=steps)
        if args.trace_out:
            log(f"schedule trace -> {args.trace_out}")
        per_step = pipe.denoise_seconds / steps
        st = pipe.teacache_stats
        tag = "replay" if schedule is not None else "thresh=0.2"
        log(f"sparse+teacache({tag}, residual={args.teacache_residual}"
            f"{', offload' if args.teacache_offload else ''}): "
            f"{per_step:.2f}s/step over {steps} steps "
            f"(skipped {st['skipped']}/{st['skipped'] + st['computed']} "
            f"CFG calls)")
        log_density(pipe, "teacache")
        if "sparse" in results and "flash" in results and st["skipped"]:
            t_call = results["sparse"] / 2          # per CFG call
            tot = pipe.denoise_seconds
            t_skip = max((tot - st["computed"] * t_call)
                         / st["skipped"], 0)
            for frac in (0.5, 0.68):
                t_step = 2 * ((1 - frac) * t_call + frac * t_skip)
                log(f"at {frac:.0%} call-skip rate: {t_step:.2f}s/step -> "
                    f"{results['flash'] / t_step:.2f}x vs our dense "
                    f"(reference wan2.1 teacache regime ~4.61x overall)")


if __name__ == "__main__":
    main()

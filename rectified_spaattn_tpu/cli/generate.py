"""Unified generation CLI — replaces the reference's eight driver scripts
(SURVEY §7: "one `generate` entrypoint + per-model configs").

    python -m rectified_spaattn_tpu.cli.generate --model hunyuan \
        --height 720 --width 1280 --frame 128 --sa_drop_rate 0.8 \
        --p_remain_rates 0.3 --enable_teacache --mode sparse \
        --prompt "several hot air balloons flying over a city."

CLI names mirror the reference (scripts/main_hunyuan.py:213-225,
main_wan21t2v.py:212-226).  Without local checkpoints (--ckpt_dir) the run
uses seeded random weights at a scaled-down config — exercising the full
sparse/TeaCache path for timing and smoke purposes.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from datetime import datetime

import numpy as np

MODEL_CHOICES = (
    "hunyuan", "hunyuan-i2v", "wan21-t2v", "wan21-i2v", "wan22-ti2v",
    "wan22-t2v", "wan22-i2v", "cogvideox-t2v", "cogvideox-i2v",
    "flux-upscale",
)

DEFAULTS = {
    # (sa_drop_rate, teacache_thresh) per reference Inference.md;
    # hunyuan-i2v (token_replace, no reference driver) inherits the
    # hunyuan T2V operating point
    "hunyuan": (0.8, 0.15), "hunyuan-i2v": (0.8, 0.15),
    "wan21-t2v": (0.75, 0.2),
    "wan21-i2v": (0.75, 0.3), "wan22-ti2v": (0.75, 0.1),
    "wan22-t2v": (0.85, 0.2), "wan22-i2v": (0.85, 0.3),
    "cogvideox-t2v": (0.85, 0.2), "cogvideox-i2v": (0.75, 0.2),
    "flux-upscale": (0.9, 0.8),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=MODEL_CHOICES, default="hunyuan")
    p.add_argument("--prompt", type=str,
                   default="several hot air balloons flying over a city.")
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--frame", type=int, default=128)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--sa_drop_rate", type=float, default=None)
    p.add_argument("--p_remain_rates", type=float, default=0.3)
    p.add_argument("--enable_teacache", action="store_true")
    p.add_argument("--teacache_thresh", "--rel_l1_thresh", type=float,
                   default=None, dest="teacache_thresh")
    p.add_argument("--use_ret_steps", action="store_true")
    p.add_argument("--teacache_signal_scale", type=float, default=1.0,
                   help="multiplier on the raw rel-L1 TeaCache signal — "
                        "random-weight bench calibration only "
                        "(cache/calibrate.py); real checkpoints use 1.0")
    p.add_argument("--trace_out", type=str, default=None,
                   help="write the TeaCache schedule trace (raw signals "
                        "+ decisions) as JSON for reference-code replay")
    p.add_argument("--mode", choices=["sparse", "flash", "torch", "vanilla"],
                   default="sparse")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways: shard attention heads and "
                        "params over the first N local devices "
                        "(all pipeline families; heads %% N == 0)")
    p.add_argument("--controlnet_dir", type=str, default=None,
                   help="FluxControlNetModel snapshot for flux-upscale "
                        "(default: <ckpt_dir>/controlnet if present; "
                        "reference: jasperai/Flux.1-dev-Controlnet-"
                        "Upscaler, main_upflux.py:308-311)")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="local HF snapshot dir with safetensors")
    p.add_argument("--out_dir", type=str, default="./outputs")
    p.add_argument("--scale", type=float, default=1.0,
                   help="model-size scale for random-weight smoke runs")
    p.add_argument("--profile", type=str, default=None, metavar="LOG_DIR",
                   help="write a jax.profiler trace of the run to LOG_DIR")
    p.add_argument("--scan_blocks", action="store_true",
                   help="lax.scan block execution (one traced block per "
                        "attention gate): the full-depth serving mode — "
                        "required to fit 13-14B models on one 16 GB chip")
    p.add_argument("--dispatch_segments", type=int, default=1,
                   help="split the Hunyuan block scan into N dispatches "
                        "per step (needs --scan_blocks) — for runtimes "
                        "with a per-dispatch execution watchdog")
    p.add_argument("--quant", type=int, default=0, choices=(0, 4, 8),
                   help="weight-only quantization bits (models/quant.py); "
                        "4 fits the full 13B flagship on one v5e")
    p.add_argument("--group_rows", type=int, default=1,
                   help="grouped-row kernel execution: G query blocks per "
                        "kernel program over the union of their key sets "
                        "(SparseConfig.group_rows; 2 measured faster at "
                        "the Hunyuan 720p point, RESULTS_r4.md)")
    p.add_argument("--plan_row_chunk", type=int, default=0,
                   help="row-tile the sparse-plan build into chunks of N "
                        "query rows — bounds the fp32 plan temporaries "
                        "(a peak-HBM lever for runs at the 16 GB ceiling)")
    p.add_argument("--head_chunk", type=int, default=0,
                   help="run the attention site in tiles of N heads "
                        "(SparseConfig.head_chunk): divides all "
                        "attention-path temporaries by H/N at identical "
                        "math — the peak-HBM lever for trees too large "
                        "to leave full-head headroom (Wan2.1-I2V 16.4B)")
    p.add_argument("--kv_pack", action="store_true",
                   help="pack K|V into one producer stream so the kernel "
                        "gathers from it instead of materialising its own "
                        "packed copy (SparseConfig.kv_pack; ~1.5 GB lower "
                        "peak HBM at video scale)")
    p.add_argument("--plan_kv_tile", type=int, default=0,
                   help="tile the plan's column stats (pooled K/V, GAPR "
                        "deviations) over N key blocks — the K/V-side "
                        "companion to --plan_row_chunk")
    p.add_argument("--mlp_chunk", type=int, default=1,
                   help="evaluate each block's FFN over N static sequence "
                        "slices (layers.MLP.chunk) — identical math, "
                        "~1.5 GB lower peak HBM at video scale (Hunyuan "
                        "and Wan families)")
    p.add_argument("--image", type=str, default=None,
                   help="conditioning image for I2V/TI2V models (png/jpg; "
                        "npy accepted for headless runs)")
    p.add_argument("--teacache_residual", choices=("bf16", "int8"),
                   default="bf16",
                   help="TeaCache residual encode: int8 (per-row absmax) "
                        "halves both residual buffers — the full-depth "
                        "organic-run HBM lever (Hunyuan/Wan families)")
    p.add_argument("--teacache_offload", action="store_true",
                   help="keep the TeaCache previous_residual in host RAM "
                        "between steps (frees its HBM; one transfer per "
                        "call)")
    p.add_argument("--replay_trace", type=str, default=None,
                   help="REPLAY a recorded TeaCache schedule (a trace_out "
                        "JSON) instead of deciding from the signal")
    p.add_argument("--density", action="store_true",
                   help="probe the executed mask density once per step "
                        "(reported in the output JSON)")
    p.add_argument("--host_swap", action="store_true",
                   help="A14B (wan22-t2v/i2v): keep both transformer "
                        "trees in host RAM and swap the low-noise tree "
                        "onto the chip once at the boundary step — two "
                        "full 14B trees cannot co-reside in 16 GB")
    return p.parse_args(argv)


def _load_image(path: str, height: int, width: int):
    """[1, 3, H, W] float32 in [-1, 1]."""
    import jax.numpy as jnp
    if path.endswith(".npy"):
        arr = np.load(path).astype(np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.shape[-1] in (3, 4):       # HWC -> CHW
            arr = arr[..., :3].transpose(0, 3, 1, 2)
        if arr.max() > 1.5:
            arr = arr / 127.5 - 1.0
    else:
        from PIL import Image
        img = Image.open(path).convert("RGB").resize((width, height))
        arr = (np.asarray(img, np.float32) / 127.5 - 1.0)
        arr = arr.transpose(2, 0, 1)[None]
    import jax
    t = jnp.asarray(arr)
    return jax.image.resize(t, (1, 3, height, width), "linear")


def _random_text(prompt: str, length: int, dim: int, batch: int = 1):
    """Deterministic pseudo-embedding of a prompt (random-weight demos)."""
    import jax
    import jax.numpy as jnp
    seed = abs(hash(prompt)) % (2 ** 31)
    emb = jax.random.normal(jax.random.PRNGKey(seed), (batch, length, dim))
    n = min(max(len(prompt.split()), 4), length)
    mask = jnp.zeros((batch, length), bool).at[:, :n].set(True)
    return emb * mask[..., None], mask


def _interpret() -> bool:
    """Pallas kernels need interpret mode off-TPU (CPU dev boxes)."""
    import jax
    return jax.default_backend() == "cpu"


def _tp_mesh(tp: int):
    """1 x tp x 1 (dp, tp, sp) mesh over the first tp local devices, or
    None for single-device execution."""
    if tp <= 1:
        return None
    import numpy as np
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < tp:
        raise SystemExit(f"--tp {tp} but only {len(devs)} devices")
    return Mesh(np.array(devs[:tp]).reshape(1, tp, 1), ("dp", "tp", "sp"))


def _serving(args, params, supports_scan=True):
    """Apply the --quant / --scan_blocks serving options: returns
    (params, extra_pipeline_kwargs).  Quantization runs host-side
    (models/quant.py) so a 13B tree never holds two device copies."""
    scan = getattr(args, "scan_blocks", False)
    quant = getattr(args, "quant", 0)
    if scan and not supports_scan:
        raise SystemExit(f"--scan_blocks is not supported for this family")
    if quant:
        import jax
        from ..models.quant import quantize_params
        params = quantize_params(jax.device_get(params), bits=quant)
    kw = {"scan_blocks": True} if scan and supports_scan else {}
    if getattr(args, "group_rows", 1) > 1:
        kw["group_rows"] = args.group_rows
    if getattr(args, "plan_row_chunk", 0) > 0:
        kw["plan_row_chunk"] = args.plan_row_chunk
    if getattr(args, "plan_kv_tile", 0) > 0:
        kw["plan_kv_tile"] = args.plan_kv_tile
    if getattr(args, "kv_pack", False):
        kw["kv_pack"] = True
    if getattr(args, "head_chunk", 0) > 0:
        kw["head_chunk"] = args.head_chunk
    return params, kw


def _from_ckpt(args, family):
    """Assemble (cfg, params, encoders, vae_encode, vae_decode) from a
    local diffusers snapshot (reference: one from_pretrained call gives
    text-encode -> denoise -> VAE decode -> mp4, main_hunyuan.py:232-292)."""
    from ..models.pretrained import (load_transformer, load_vae,
                                     load_text_encoders)
    cfg, params = load_transformer(family, args.ckpt_dir)
    video = family != "flux"
    vae_encode, vae_decode = load_vae(args.ckpt_dir, video=video)
    encoders = load_text_encoders(family, args.ckpt_dir)
    return cfg, params, encoders, vae_encode, vae_decode


def _encode_prompt(encoders, prompt, dim, max_len, negative=""):
    """(cond, mask), (uncond, umask) through the primary encoder, or the
    hash fallback when no checkpoint encoders exist."""
    import jax.numpy as jnp
    if encoders:
        enc = encoders[0]
        emb, mask = enc(prompt)
        nemb, nmask = enc(negative)
        return ((jnp.asarray(emb), jnp.asarray(mask)),
                (jnp.asarray(nemb), jnp.asarray(nmask)))
    c = _random_text(prompt, max_len, dim)
    u = _random_text(negative or "", max_len, dim)
    return c, u


def build_hunyuan(args):
    """Returns (pipe, inputs, extra) — extra carries the token_replace
    first-frame latent for hunyuan-i2v (empty for T2V)."""
    import dataclasses as _dc

    def _segs(sv):
        if args.dispatch_segments > 1 and sv.get("scan_blocks"):
            sv["dispatch_segments"] = args.dispatch_segments
        return sv
    import jax.numpy as jnp
    from ..models.hunyuan import HunyuanVideoConfig, HunyuanVideoDiT
    from ..pipelines import HunyuanVideoPipeline
    from ..pipelines.hunyuan import i2v_first_frame
    is_i2v = getattr(args, "model", "hunyuan") == "hunyuan-i2v"
    if args.ckpt_dir:
        cfg, params, encoders, vae_encode, vae_decode = _from_ckpt(
            args, "hunyuan")
        if args.mlp_chunk > 1:
            cfg = _dc.replace(cfg, mlp_chunk=args.mlp_chunk)
        if is_i2v and cfg.image_condition_type is None:
            # T2V-shaped snapshot driven as I2V: force the token_replace
            # path (the 720p I2V snapshot carries the flag itself)
            cfg = _dc.replace(cfg, image_condition_type="token_replace")
        model = HunyuanVideoDiT(cfg)
        (text, mask), _ = _encode_prompt(encoders, args.prompt,
                                         cfg.text_dim, 256)
        pooled = None
        if len(encoders) > 1:    # CLIP pooled prompt embeds
            pooled = jnp.asarray(encoders[1].pooled(args.prompt))
        params, sv = _serving(args, params)
        sv = _segs(sv)
        pipe = HunyuanVideoPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.num_steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain_rates,
            mode="flash" if args.mode == "torch" else args.mode,
            enable_teacache=args.enable_teacache,
            rel_l1_thresh=args.teacache_thresh, interpret=_interpret(),
            vae_decode=vae_decode, mesh=_tp_mesh(args.tp), **sv)
        extra = {}
        if is_i2v and cfg.image_condition_type == "latent_concat":
            # v1 (544p) variant: [noise 16 | image latents 16 | mask 1]
            from ..pipelines.hunyuan import i2v_condition_concat
            if args.image is not None and vae_encode is not None:
                img = _load_image(args.image, args.height, args.width)
                extra["condition"] = i2v_condition_concat(
                    img, args.frame, vae_encode, pipe.grid[0])
            else:
                extra["condition"] = jnp.zeros(
                    (1, cfg.in_channels - cfg.out_channels, *pipe.grid),
                    jnp.float32)
        elif is_i2v:
            if args.image is not None and vae_encode is not None:
                img = _load_image(args.image, args.height, args.width)
                extra["first_frame"] = i2v_first_frame(img, vae_encode)
            else:
                # I2V without --image: neutral zero first frame so the
                # token_replace path still runs (matches the Wan I2V
                # zero-conditioning convention above)
                extra["first_frame"] = jnp.zeros(
                    (1, cfg.in_channels, 1, *pipe.grid[1:]), jnp.float32)
        return pipe, (text, mask, pooled), extra
    else:
        s = args.scale
        cfg = HunyuanVideoConfig(
            hidden_dim=max(128, int(3072 * s) // 128 * 128),
            heads=max(1, int(24 * s)), num_dual_blocks=max(1, int(20 * s)),
            num_single_blocks=max(1, int(40 * s)), text_dim=512,
            pooled_dim=128, num_refiner_blocks=1,
            image_condition_type="token_replace" if is_i2v else None,
            mlp_chunk=args.mlp_chunk)
    model = HunyuanVideoDiT(cfg)
    text, mask = _random_text(args.prompt, 256, cfg.text_dim)
    import jax
    # params are sequence-length independent: init on a tiny grid so the
    # (dense) init trace never sees video-scale attention
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, 2 * cfg.patch_size_t,
                   8 * cfg.patch_size, 8 * cfg.patch_size)),
        jnp.array([0.0]), text, mask, jnp.array([6000.0]), None, None)
    params, sv = _serving(args, params)
    sv = _segs(sv)
    pipe = HunyuanVideoPipeline(
        model=model, params=params, height=args.height, width=args.width,
        frames=args.frame, num_steps=args.num_steps,
        sa_drop_rate=args.sa_drop_rate, p_remain_rates=args.p_remain_rates,
        mode="flash" if args.mode == "torch" else args.mode,
        enable_teacache=args.enable_teacache,
        rel_l1_thresh=args.teacache_thresh, interpret=_interpret(),
        mesh=_tp_mesh(args.tp), **sv)
    extra = {}
    if is_i2v:
        if args.image is not None:
            enc = _demo_vae_encoder(cfg.in_channels, (1, *pipe.grid[1:]),
                                    video=True)
            img = _load_image(args.image, args.height, args.width)
            extra["first_frame"] = i2v_first_frame(img, enc)
        else:
            extra["first_frame"] = jnp.zeros(
                (1, cfg.in_channels, 1, *pipe.grid[1:]), jnp.float32)
    return pipe, (text, mask), extra


def _demo_vae_encoder(zc, grid, video=True):
    """Random-weight tiny VAEEncoder closure for checkpoint-less demos:
    pixels [B,3,(F,)H,W] -> latents [B,zc,*grid]."""
    import jax
    import jax.numpy as jnp
    from ..models import VAEConfig, VAEEncoder

    cfg = VAEConfig.tiny(video=video)
    cfg = VAEConfig(latent_channels=zc,
                    block_out_channels=cfg.block_out_channels,
                    layers_per_block=1,
                    temporal_upsample=cfg.temporal_upsample,
                    spatial_upsample=cfg.spatial_upsample,
                    video=video, mid_attention=False)
    enc = VAEEncoder(cfg)
    params = {}

    def encode(video_px):
        nonlocal params
        # the tiny encoder downsamples 2x spatial / 2x temporal; resize the
        # input so its OUTPUT lands exactly on the latent grid
        b = video_px.shape[0]
        tgt = (b, video_px.shape[1], 2 * grid[0] - 1,
               2 * grid[1], 2 * grid[2])
        px = jax.image.resize(video_px.astype(jnp.float32), tgt, "linear")
        if not params:
            params = enc.init(jax.random.PRNGKey(17), px)
        return enc.apply(params, px)

    return encode


def build_wan(args):
    import jax
    import jax.numpy as jnp
    from ..models.wan import WanConfig, WanDiT
    from ..pipelines import WanPipeline, Wan22A14BPipeline
    s = args.scale
    is_22 = args.model.startswith("wan22")
    is_i2v = args.model.endswith("i2v") and args.model != "wan22-ti2v"
    ti2v_image = args.model == "wan22-ti2v" and args.image is not None
    vae_stride = (4, 32, 32) if args.model == "wan22-ti2v" else (4, 16, 16)
    latent_ch = 16

    if args.ckpt_dir:
        from ..pipelines.wan import i2v_condition, ti2v_first_frame
        cfg, params, encoders, vae_encode, vae_decode = _from_ckpt(
            args, "wan")
        if args.mlp_chunk > 1:
            cfg = _dc.replace(cfg, mlp_chunk=args.mlp_chunk)
        model = WanDiT(cfg)
        (text, _), (neg, _) = _encode_prompt(encoders, args.prompt,
                                             cfg.text_dim, 512)
        params, sv = _serving(args, params)
        a14b = args.model in ("wan22-t2v", "wan22-i2v")
        pipe = WanPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.num_steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain_rates,
            mode="flash" if args.mode == "torch" else args.mode,
            enable_teacache=args.enable_teacache,
            teacache_thresh=args.teacache_thresh,
            use_ret_steps=args.use_ret_steps, vae_stride=vae_stride,
            is_i2v=is_i2v, interpret=_interpret(),
            warm_last_layers=2 if args.model in ("wan22-t2v", "wan22-i2v")
            else 0,
            scheduler="euler" if is_22 else "unipc", vae_decode=vae_decode,
            mesh=_tp_mesh(args.tp),
            defer_device=args.host_swap and a14b, **sv)
        extra = {}
        if args.image is not None and vae_encode is not None and (
                is_i2v or args.model == "wan22-ti2v"):
            img = _load_image(args.image, args.height, args.width)
            if args.model == "wan22-ti2v":
                extra["first_frame"] = ti2v_first_frame(img, vae_encode)
            else:
                extra["condition"] = i2v_condition(
                    img, args.frame, vae_encode, lt=pipe.grid[0])
        if is_i2v and "condition" not in extra:
            # I2V without --image: neutral zero conditioning (black
            # frame) so the conditioned in_channels architecture still
            # runs instead of shape-erroring at the scheduler step.
            extra["condition"] = jnp.zeros(
                (1, cfg.in_channels - cfg.out_channels, *pipe.grid),
                jnp.float32)
        if args.model in ("wan22-t2v", "wan22-i2v"):
            # A14B: transformer_2 lives beside transformer in the snapshot
            import dataclasses as _dc
            import os as _os
            low = pipe
            t2 = _os.path.join(args.ckpt_dir, "transformer_2")
            if _os.path.isdir(t2):
                from ..models.pretrained import load_transformer
                cfg2, params2 = load_transformer(
                    "wan", args.ckpt_dir + "/transformer_2")
                params2, _ = _serving(args, params2)
                low = _dc.replace(pipe, model=WanDiT(cfg2), params=params2)
            # host_swap with a shared tree (no transformer_2 on disk) is
            # meaningless — both pipes would swap the same params
            swap = args.host_swap and low is not pipe
            return Wan22A14BPipeline(high=pipe, low=low, host_swap=swap), \
                (text, neg), extra
        return pipe, (text, neg), extra

    cfg = WanConfig(
        # I2V transformers take [noise 16 | mask 4 | image latents 16]
        # (reference: main_wan21i2v.py feeds an in_channels-36 model)
        in_channels=latent_ch + 4 + latent_ch if is_i2v else latent_ch,
        out_channels=latent_ch,
        hidden_dim=max(128, int(5120 * s) // 128 * 128),
        heads=max(1, int(40 * s)), num_blocks=max(2, int(40 * s)),
        ffn_dim=max(256, int(13824 * s)), text_dim=512, freq_dim=256,
        mlp_chunk=args.mlp_chunk,
        image_cross=is_i2v and not is_22,
        per_token_timesteps=ti2v_image)
    model = WanDiT(cfg)
    text, _ = _random_text(args.prompt, 512, cfg.text_dim)
    neg, _ = _random_text("", 512, cfg.text_dim)

    def make_pipe():
        lat = jnp.zeros((1, cfg.in_channels, 2 * cfg.patch_size[0],
                         8 * cfg.patch_size[1], 8 * cfg.patch_size[2]))
        # per-token timesteps: one per TOKEN of the init latents
        pt_, ph_, pw_ = cfg.patch_size
        n_tok0 = 2 * 8 * 8            # (2*pt/pt) * (8*ph/ph) * (8*pw/pw)
        t0 = (jnp.zeros((1, n_tok0)) if cfg.per_token_timesteps
              else jnp.array([0.0]))
        img_emb0 = (jnp.zeros((1, 257, cfg.image_dim))
                    if cfg.image_cross else None)
        params = model.init(jax.random.PRNGKey(0), lat, t0, text, img_emb0)
        a14b = args.model in ("wan22-t2v", "wan22-i2v")
        defer = args.host_swap and a14b
        if defer:
            params = jax.device_get(params)   # host trees for host_swap
        params, sv = _serving(args, params)
        return WanPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.num_steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain_rates,
            mode="flash" if args.mode == "torch" else args.mode,
            enable_teacache=args.enable_teacache,
            teacache_thresh=args.teacache_thresh,
            use_ret_steps=args.use_ret_steps, vae_stride=vae_stride,
            is_i2v=is_i2v, interpret=_interpret(),
            warm_last_layers=2 if args.model in ("wan22-t2v", "wan22-i2v")
            else 0,
            scheduler="euler" if is_22 else "unipc",
            mesh=_tp_mesh(args.tp), defer_device=defer, **sv)

    extra = {}
    pipe0 = make_pipe()
    if args.image is not None and (is_i2v or ti2v_image):
        from ..pipelines.wan import i2v_condition, ti2v_first_frame
        enc = _demo_vae_encoder(latent_ch, pipe0.grid, video=True)
        img = _load_image(args.image, args.height, args.width)
        if ti2v_image:
            enc1 = _demo_vae_encoder(cfg.in_channels,
                                     (1, *pipe0.grid[1:]), video=True)
            extra["first_frame"] = ti2v_first_frame(img, enc1)
        else:
            extra["condition"] = i2v_condition(
                img, args.frame, enc, lt=pipe0.grid[0])
        if is_i2v and not is_22:
            # CLIP-vision features for the 2.1 I2V cross branch (random
            # projection stand-in without a real encoder checkpoint)
            extra["image_emb"] = jax.random.normal(
                jax.random.PRNGKey(5), (1, 257, cfg.image_dim))
    if is_i2v and "condition" not in extra:
        # I2V without --image: neutral zero conditioning (see ckpt branch)
        extra["condition"] = jnp.zeros(
            (1, cfg.in_channels - cfg.out_channels, *pipe0.grid),
            jnp.float32)
        if cfg.image_cross and "image_emb" not in extra:
            extra["image_emb"] = jnp.zeros((1, 257, cfg.image_dim))
    if args.model in ("wan22-t2v", "wan22-i2v"):
        pipe = Wan22A14BPipeline(high=pipe0, low=make_pipe(),
                                 host_swap=args.host_swap)
        extra.pop("image_emb", None)
        return pipe, (text, neg), extra
    return pipe0, (text, neg), extra


def build_cogvideox(args):
    import jax
    import jax.numpy as jnp
    from ..models.cogvideox import CogVideoXConfig, CogVideoXDiT
    from ..pipelines import CogVideoXPipeline
    s = args.scale
    is_i2v = args.model.endswith("i2v")
    latent_ch = 16

    if args.ckpt_dir:
        from ..pipelines.cogvideox import cog_i2v_condition
        cfg, params, encoders, vae_encode, vae_decode = _from_ckpt(
            args, "cogvideox")
        model = CogVideoXDiT(cfg)
        (text, _), (neg, _) = _encode_prompt(encoders, args.prompt,
                                             cfg.text_dim, 226)
        params, sv = _serving(args, params)
        pipe = CogVideoXPipeline(
            model=model, params=params, height=args.height,
            width=args.width, frames=args.frame, num_steps=args.num_steps,
            sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain_rates,
            mode="flash" if args.mode == "torch" else args.mode,
            enable_teacache=args.enable_teacache,
            teacache_thresh=args.teacache_thresh,
            is_i2v=is_i2v, interpret=_interpret(), vae_decode=vae_decode,
            mesh=_tp_mesh(args.tp), **sv)
        extra = {}
        if is_i2v and args.image is not None and vae_encode is not None:
            img = _load_image(args.image, args.height, args.width)
            extra["condition"] = cog_i2v_condition(img, vae_encode,
                                                   pipe.grid)
        return pipe, (text, neg), extra

    hidden = max(128, int(3072 * s) // 64 * 64)
    cfg = CogVideoXConfig(
        # I2V: image latents concatenated along channels -> in_channels 32
        in_channels=2 * latent_ch if is_i2v else latent_ch,
        out_channels=latent_ch,
        hidden_dim=hidden,
        heads=hidden // 64,        # keep head_dim 64 = rope_axes_dim sum
        num_blocks=max(2, int(42 * s)),
        text_dim=512, time_embed_dim=256)
    model = CogVideoXDiT(cfg)
    text, _ = _random_text(args.prompt, 256, cfg.text_dim)
    neg, _ = _random_text("", 256, cfg.text_dim)
    lat = jnp.zeros((1, cfg.in_channels, 2 * cfg.patch_size_t,
                     8 * cfg.patch_size, 8 * cfg.patch_size))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([0.0]), text)
    params, sv = _serving(args, params)
    pipe = CogVideoXPipeline(
        model=model, params=params, height=args.height, width=args.width,
        frames=args.frame, num_steps=args.num_steps,
        sa_drop_rate=args.sa_drop_rate, p_remain_rates=args.p_remain_rates,
        mode="flash" if args.mode == "torch" else args.mode,
        enable_teacache=args.enable_teacache,
        teacache_thresh=args.teacache_thresh,
        is_i2v=is_i2v, interpret=_interpret(), mesh=_tp_mesh(args.tp),
        **sv)
    extra = {}
    if is_i2v and args.image is not None:
        from ..pipelines.cogvideox import cog_i2v_condition
        img = _load_image(args.image, args.height, args.width)
        enc = _demo_vae_encoder(latent_ch, (1, *pipe.grid[1:]), video=True)
        extra["condition"] = cog_i2v_condition(img, enc, pipe.grid)
    return pipe, (text, neg), extra


def build_flux(args):
    import jax
    import jax.numpy as jnp
    from ..models.flux import FluxConfig, FluxDiT
    from ..pipelines import FluxPipeline, FluxUpscalePipeline
    s = args.scale

    if args.ckpt_dir:
        import os
        import warnings
        from ..pipelines.flux import flux_unpack_latents
        cfg, params, encoders, vae_encode, vae_decode = _from_ckpt(
            args, "flux")
        model = FluxDiT(cfg)
        (text, mask), _ = _encode_prompt(encoders, args.prompt,
                                         cfg.text_dim, 512)
        pooled = jnp.zeros((1, cfg.pooled_dim))
        if len(encoders) > 1:
            pooled = jnp.asarray(encoders[1].pooled(args.prompt))

        params, sv = _serving(args, params)

        def mk(hh, ww, steps, decode=None):
            return FluxPipeline(
                model=model, params=params, height=hh, width=ww,
                num_steps=steps, sa_drop_rate=args.sa_drop_rate,
                p_remain_rates=args.p_remain_rates,
                mode="flash" if args.mode == "torch" else args.mode,
                enable_teacache=args.enable_teacache,
                rel_l1_thresh=args.teacache_thresh, interpret=_interpret(),
                vae_decode=decode, mesh=_tp_mesh(args.tp), **sv)

        # base stage returns TOKENS (control prep needs them); only the
        # upscaled stage decodes to pixels (with the 2x2 token unpack)
        base = mk(args.height // 4, args.width // 4, args.num_steps)
        params = base.params   # ONE device copy (stacked/quantized) shared
        gh_u, gw_u = args.height // 16, args.width // 16
        up_decode = (
            (lambda t: vae_decode(flux_unpack_latents(t, gh_u, gw_u)))
            if vae_decode is not None else None)
        up = mk(args.height, args.width, args.num_steps, decode=up_decode)

        # ControlNet: a separate snapshot (the reference loads
        # jasperai/Flux.1-dev-Controlnet-Upscaler next to the base model,
        # main_upflux.py:308-311) — --controlnet_dir or
        # <ckpt_dir>/controlnet
        cn = cn_params = None
        cn_dir = args.controlnet_dir or os.path.join(args.ckpt_dir,
                                                     "controlnet")
        if os.path.isdir(cn_dir):
            from ..models.flux import FluxControlNet
            from ..models.pretrained import load_flux_controlnet
            cn_cfg, cn_params = load_flux_controlnet(cn_dir)
            cn = FluxControlNet(cn_cfg)
        else:
            warnings.warn(
                "flux-upscale: no ControlNet snapshot found at "
                f"{cn_dir!r}; stage 2 degrades to img2img (strength 0.7) "
                "instead of the reference's ControlNet-conditioned "
                "upscale — pass --controlnet_dir to match the reference")
        return FluxUpscalePipeline(
            base=base, up=up, controlnet=cn, controlnet_params=cn_params,
            vae_decode=vae_decode, vae_encode=vae_encode), (text, mask,
                                                            pooled)

    cfg = FluxConfig(
        hidden_dim=max(128, int(3072 * s) // 128 * 128),
        heads=max(1, int(24 * s)), num_dual_blocks=max(1, int(19 * s)),
        num_single_blocks=max(1, int(38 * s)), text_dim=512, pooled_dim=128)
    model = FluxDiT(cfg)
    text, mask = _random_text(args.prompt, 512, cfg.text_dim)
    import numpy as _np
    pooled = jnp.asarray(_np.random.default_rng(0).standard_normal(
        (1, cfg.pooled_dim)), jnp.float32)
    gh, gw = args.height // 16, args.width // 16
    tokens = jnp.zeros((1, 64, cfg.in_channels))
    params = model.init(jax.random.PRNGKey(0), tokens, jnp.array([0.5]),
                        text, pooled, jnp.array([3.5]), 8, 8)

    params, sv = _serving(args, params)

    def mk(hh, ww, steps):
        return FluxPipeline(
            model=model, params=params, height=hh, width=ww,
            num_steps=steps, sa_drop_rate=args.sa_drop_rate,
            p_remain_rates=args.p_remain_rates,
            mode="flash" if args.mode == "torch" else args.mode,
            enable_teacache=args.enable_teacache,
            rel_l1_thresh=args.teacache_thresh, interpret=_interpret(),
            mesh=_tp_mesh(args.tp), **sv)

    base = mk(args.height // 4, args.width // 4, args.num_steps)
    params = base.params   # ONE device copy (stacked/quantized) shared
    up = mk(args.height, args.width, args.num_steps)
    # ControlNet conditioning network (reference: jasperai upscaler,
    # main_upflux.py:300-305).  Random-weight demo: the zero-init output
    # projections are nudged off zero so the conditioned path is exercised.
    from ..models.flux import FluxControlNet, FluxControlNetConfig
    cn_cfg = FluxControlNetConfig(
        in_channels=cfg.in_channels, cond_channels=cfg.in_channels,
        hidden_dim=cfg.hidden_dim, heads=cfg.heads,
        num_dual_blocks=max(1, int(5 * s)), text_dim=cfg.text_dim,
        pooled_dim=cfg.pooled_dim)
    cn = FluxControlNet(cn_cfg)
    cn_params = cn.init(jax.random.PRNGKey(21), tokens, tokens,
                        jnp.array([0.5]), text, pooled, jnp.array([3.5]),
                        8, 8)
    cn_params = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(
            jax.random.PRNGKey(22), x.shape, x.dtype), cn_params)
    pipe = FluxUpscalePipeline(base=base, up=up, controlnet=cn,
                               controlnet_params=cn_params)
    return pipe, (text, mask, pooled)


def main(argv=None):
    args = parse_args(argv)
    drop, tea = DEFAULTS[args.model]
    if args.sa_drop_rate is None:
        args.sa_drop_rate = drop
    if args.teacache_thresh is None:
        args.teacache_thresh = tea

    from ..utils import set_seed
    from ..utils.timing import profiler_trace
    set_seed(args.seed)

    from ..cache.teacache import trace_to
    with profiler_trace(args.profile), trace_to(args.trace_out):
        latents, pipe = _generate(args)

    os.makedirs(args.out_dir, exist_ok=True)
    stamp = datetime.fromtimestamp(time.time()).strftime("%m-%d-%H:%M:%S")
    # elapsed denoise seconds in the filename, as the reference does
    # (main_hunyuan.py:288-292); decoded pixels go to mp4/png, raw
    # latents to .npy
    stem = os.path.join(
        args.out_dir, f"{stamp}_{args.model}_{pipe.denoise_seconds:.0f}s")
    arr = np.asarray(latents)
    if arr.ndim == 5 and arr.shape[1] == 3:          # [B,3,F,H,W] pixels
        from ..utils.video import save_video
        path = save_video(arr[0].transpose(1, 2, 3, 0), stem + ".mp4")
    elif arr.ndim == 4 and arr.shape[1] == 3:        # [B,3,H,W] image
        from ..utils.video import save_image
        path = save_image(arr[0].transpose(1, 2, 0), stem + ".png")
    else:
        path = stem + ".npy"
        np.save(path, arr)
    dens = getattr(pipe, "density_samples", None)
    print(json.dumps({
        "output": path,
        "denoise_seconds": round(pipe.denoise_seconds, 2),
        "teacache": getattr(pipe, "teacache_stats", None),
        "density": (round(float(np.mean(dens)), 4) if dens else None),
    }))


def _set_signal_scale(pipe, args):
    """Propagate --teacache_signal_scale to the pipelines that carry the
    calibration knob (the timestep-signal families: Wan, CogVideoX)."""
    for p in ((pipe.high, pipe.low) if hasattr(pipe, "high") else (pipe,)):
        if hasattr(p, "teacache_signal_scale"):
            p.teacache_signal_scale = args.teacache_signal_scale


def _set_teacache_opts(pipe, args):
    """Propagate the TeaCache residual/offload/replay + density-probe
    options (set post-construction: all are read at first call, not in
    __post_init__)."""
    schedule = None
    if args.replay_trace:
        from ..cache import schedule_from_trace
        schedule = schedule_from_trace(args.replay_trace)
    for p in ((pipe.high, pipe.low) if hasattr(pipe, "high") else (pipe,)):
        if hasattr(p, "teacache_residual"):
            p.teacache_residual = args.teacache_residual
            p.teacache_offload = args.teacache_offload
            p.teacache_schedule = schedule
        if hasattr(p, "density_probe"):
            p.density_probe = args.density


def _generate(args):
    if args.model.startswith("hunyuan"):
        pipe, inputs, extra = build_hunyuan(args)
        _set_teacache_opts(pipe, args)
        latents = pipe(*inputs, seed=args.seed, **extra)
    elif args.model.startswith("wan"):
        pipe, inputs, extra = build_wan(args)
        _set_signal_scale(pipe, args)
        _set_teacache_opts(pipe, args)
        if hasattr(pipe, "high"):   # A14B dual transformer
            import jax, jax.numpy as jnp
            cfgm = pipe.high.model.cfg
            cond = extra.get("condition")
            noise_ch = cfgm.in_channels - (
                cond.shape[1] if cond is not None else 0)
            rng = jax.random.PRNGKey(args.seed)
            lat = jax.random.normal(
                rng, (1, noise_ch, *pipe.high.grid), jnp.float32)
            latents = pipe.denoise(lat, *inputs, condition=cond)
        else:
            latents = pipe(*inputs, seed=args.seed, **extra)
    elif args.model.startswith("cogvideox"):
        pipe, inputs, extra = build_cogvideox(args)
        _set_signal_scale(pipe, args)
        latents = pipe(*inputs, seed=args.seed, **extra)
    elif args.model == "flux-upscale":
        pipe, inputs = build_flux(args)
        latents = pipe(*inputs, seed=args.seed)
        pipe = pipe.up   # report the high-res stage's timing
    else:
        raise SystemExit(f"unknown model {args.model}")
    return latents, pipe


if __name__ == "__main__":
    main()

"""Checkpoint→pipeline assembly: one call from an HF snapshot directory to
(model, params, text encoder, VAE encode/decode) per family.

The reference gets all of this from ``diffusers.*Pipeline.from_pretrained``
(scripts/main_hunyuan.py:232-238); here each sub-model is converted
tensor-by-tensor into the flax modules (models/weights.py) with the module
configs parsed from the snapshot's own ``config.json`` files, so
``--ckpt_dir`` needs no hand-maintained size tables.

Layout expected (a diffusers snapshot):
    <root>/transformer/*.safetensors + config.json
    <root>/vae/*.safetensors + config.json
    <root>/text_encoder[_2]/  (+ tokenizer[_2]/)      — via transformers
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _subdir(root: str, name: str) -> Optional[str]:
    p = os.path.join(root, name)
    return p if os.path.isdir(p) else None


# ---------------------------------------------------------------------------
# Transformer configs from diffusers config.json
# ---------------------------------------------------------------------------

def wan_config_from_json(cfg: dict):
    from .wan import WanConfig
    heads = cfg["num_attention_heads"]
    hd = cfg["attention_head_dim"]
    return WanConfig(
        in_channels=cfg["in_channels"], out_channels=cfg["out_channels"],
        hidden_dim=heads * hd, heads=heads, head_dim=hd,
        num_blocks=cfg["num_layers"], ffn_dim=cfg["ffn_dim"],
        patch_size=tuple(cfg["patch_size"]), text_dim=cfg["text_dim"],
        freq_dim=cfg["freq_dim"],
        rope_axes_dim=tuple(cfg.get("rope_axes_dim", (hd - 2 * (hd // 3),
                                                      hd // 3, hd // 3))),
        image_cross=cfg.get("image_dim") is not None,
        image_dim=cfg.get("image_dim") or 1280,
        per_token_timesteps=bool(cfg.get("expand_timesteps", False)))


def hunyuan_config_from_json(cfg: dict):
    from .hunyuan import HunyuanVideoConfig
    heads = cfg["num_attention_heads"]
    hd = cfg["attention_head_dim"]
    return HunyuanVideoConfig(
        in_channels=cfg["in_channels"], out_channels=cfg["out_channels"],
        hidden_dim=heads * hd, heads=heads, head_dim=hd,
        num_dual_blocks=cfg["num_layers"],
        num_single_blocks=cfg["num_single_layers"],
        num_refiner_blocks=cfg.get("num_refiner_layers", 2),
        patch_size=cfg.get("patch_size", 2),
        patch_size_t=cfg.get("patch_size_t", 1),
        text_dim=cfg.get("text_embed_dim", 4096),
        pooled_dim=cfg.get("pooled_projection_dim", 768),
        rope_axes_dim=tuple(cfg.get("rope_axes_dim", (16, 56, 56))),
        guidance_embeds=bool(cfg.get("guidance_embeds", True)),
        # HunyuanVideo-I2V 720p (v2) snapshots carry
        # image_condition_type="token_replace" in the transformer config
        # (diffusers HunyuanVideoTransformer3DModel)
        image_condition_type=cfg.get("image_condition_type"))


def flux_config_from_json(cfg: dict):
    from .flux import FluxConfig
    heads = cfg["num_attention_heads"]
    hd = cfg["attention_head_dim"]
    return FluxConfig(
        in_channels=cfg["in_channels"],
        out_channels=cfg.get("out_channels") or cfg["in_channels"],
        hidden_dim=heads * hd, heads=heads, head_dim=hd,
        num_dual_blocks=cfg["num_layers"],
        num_single_blocks=cfg["num_single_layers"],
        text_dim=cfg.get("joint_attention_dim", 4096),
        pooled_dim=cfg.get("pooled_projection_dim", 768),
        rope_axes_dim=tuple(cfg.get("axes_dims_rope", (16, 56, 56))),
        guidance_embeds=bool(cfg.get("guidance_embeds", True)))


def cogvideox_config_from_json(cfg: dict):
    from .cogvideox import CogVideoXConfig
    heads = cfg["num_attention_heads"]
    hd = cfg["attention_head_dim"]
    return CogVideoXConfig(
        in_channels=cfg["in_channels"], out_channels=cfg["out_channels"],
        hidden_dim=heads * hd, heads=heads, head_dim=hd,
        num_blocks=cfg["num_layers"],
        text_dim=cfg.get("text_embed_dim", 4096),
        time_embed_dim=cfg.get("time_embed_dim", 512),
        patch_size=cfg.get("patch_size", 2),
        patch_size_t=cfg.get("patch_size_t") or 1,
        use_ofs_embed=cfg.get("ofs_embed_dim") is not None)


CONFIG_PARSERS = {
    "wan": wan_config_from_json,
    "hunyuan": hunyuan_config_from_json,
    "flux": flux_config_from_json,
    "cogvideox": cogvideox_config_from_json,
}


def load_transformer(family: str, root: str, dtype="bfloat16",
                     cache: bool = True, strict: bool = True):
    """(model_cls_config, params) from <root>/transformer (or <root>).

    strict=True (default) fails loudly when any state-dict key goes
    unconsumed — the naming-drift guard (tests/manifests/*_keys.json pin
    the expected key sets)."""
    import jax.numpy as jnp
    from .weights import (load_safetensors_dir, convert_strict, CONVERTERS,
                          assign_dtype)
    tdir = _subdir(root, "transformer") or root
    cfg_json = _read_json(os.path.join(tdir, "config.json"))
    cfg = CONFIG_PARSERS[family](cfg_json)

    cache_dir = os.path.join(tdir, ".rsa_tpu_params")
    if cache and os.path.isdir(cache_dir) and os.listdir(cache_dir):
        from .checkpoint import load_params
        return cfg, load_params(cache_dir)

    sd = load_safetensors_dir(tdir)
    convert = ((lambda f, s, *a, **k: convert_strict(f, s, *a, **k))
               if strict else
               (lambda f, s, *a, **k: CONVERTERS[f](s, *a, **k)))
    if family == "wan":
        params = convert("wan", sd, cfg.num_blocks)
    elif family == "hunyuan":
        params = convert("hunyuan", sd, cfg.num_dual_blocks,
                         cfg.num_single_blocks,
                         cfg.num_refiner_blocks, cfg.pooled_dim,
                         cfg.text_dim)
    elif family == "flux":
        params = convert("flux", sd, cfg.num_dual_blocks,
                         cfg.num_single_blocks)
    elif family == "cogvideox":
        params = convert("cogvideox", sd, cfg.num_blocks,
                         use_ofs=cfg.use_ofs_embed,
                         patch_size_t=cfg.patch_size_t,
                         patch_size=cfg.patch_size)
    else:
        raise ValueError(family)
    params = assign_dtype(params, getattr(jnp, dtype))
    if cache:
        try:
            from .checkpoint import save_params
            save_params(params, cache_dir)
        except Exception:
            pass
    return cfg, params


def load_flux_controlnet(root: str, dtype="bfloat16"):
    """(FluxControlNetConfig, params) from a FluxControlNetModel snapshot
    (the jasperai Flux.1-dev-Controlnet-Upscaler layout; reference loads
    it at scripts/main_upflux.py:308-311)."""
    import jax.numpy as jnp
    from .flux import FluxControlNetConfig
    from .weights import (load_safetensors_dir, convert_strict,
                          assign_dtype)
    cj = _read_json(os.path.join(root, "config.json"))
    heads = cj.get("num_attention_heads", 24)
    cfg = FluxControlNetConfig(
        in_channels=cj.get("in_channels", 64),
        cond_channels=cj.get("in_channels", 64),
        hidden_dim=heads * cj.get("attention_head_dim", 128),
        heads=heads,
        num_dual_blocks=cj.get("num_layers", 5),
        num_single_blocks=cj.get("num_single_layers", 0),
        text_dim=cj.get("joint_attention_dim", 4096),
        pooled_dim=cj.get("pooled_projection_dim", 768),
        rope_axes_dim=tuple(cj.get("axes_dims_rope", (16, 56, 56))),
        guidance_embeds=cj.get("guidance_embeds", True))
    sd = load_safetensors_dir(root)
    params = convert_strict("flux_controlnet", sd, cfg.num_dual_blocks,
                            cfg.num_single_blocks)
    return cfg, assign_dtype(params, getattr(jnp, dtype))


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def vae_config_from_json(cfg: dict, video: bool):
    """Map a diffusers VAE config.json onto VAEConfig.  The skeleton
    follows the AutoencoderKL recipe; family-specific internals beyond it
    (Wan feature caching, CogVideoX frame-batch blending) are execution
    strategies, not weight-bearing structure."""
    from .vae import VAEConfig
    n = len(cfg["block_out_channels"])
    t_ratio = cfg.get("temporal_compression_ratio", 4)
    s_ratio = cfg.get("spatial_compression_ratio",
                      2 ** (n - 1) if not video else 8)
    n_t = int(np.log2(t_ratio)) if video else 0
    n_s = int(np.log2(s_ratio))
    # diffusers decoders upsample in the FIRST blocks (reversed channels)
    temporal = tuple(i < n_t for i in range(n))
    spatial = tuple(i < n_s for i in range(n))
    return VAEConfig(
        latent_channels=cfg.get("latent_channels", 16),
        out_channels=cfg.get("out_channels", 3),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        temporal_upsample=temporal, spatial_upsample=spatial,
        video=video,
        mid_attention=bool(cfg.get("mid_block_add_attention", True)),
        quant_conv=bool(cfg.get("use_quant_conv",
                                "quant_conv" in str(cfg))),
        scaling_factor=cfg.get("scaling_factor", 1.0),
        shift_factor=cfg.get("shift_factor") or 0.0,
        latents_mean=(tuple(cfg["latents_mean"])
                      if cfg.get("latents_mean") else None),
        latents_std=(tuple(cfg["latents_std"])
                     if cfg.get("latents_std") else None))


def load_vae(root: str, video: bool = True, dtype="float32"):
    """(encode_fn, decode_fn) from <root>/vae, or (None, None) if absent.

    encode: pixels [B,3,(F,)H,W] in [-1,1] → normalised latents.
    decode: latents → pixels."""
    import jax
    import jax.numpy as jnp
    from .vae import VAEConfig, VAEDecoder, VAEEncoder
    from .weights import (load_safetensors_dir, convert_vae_decoder,
                          convert_vae_encoder, assign_dtype)
    vdir = _subdir(root, "vae")
    if vdir is None:
        return None, None
    cfg_json = _read_json(os.path.join(vdir, "config.json"))
    cfg = vae_config_from_json(cfg_json, video)
    sd = load_safetensors_dir(vdir)
    n = len(cfg.block_out_channels)
    dt = getattr(jnp, dtype)
    dec = VAEDecoder(cfg)
    dec_params = assign_dtype(
        convert_vae_decoder(sd, n, cfg.layers_per_block, cfg.video), dt)
    enc = VAEEncoder(cfg)
    try:
        enc_params = assign_dtype(
            convert_vae_encoder(sd, n, cfg.layers_per_block, cfg.video), dt)
    except KeyError:
        enc_params = None      # decoder-only snapshots

    decode = jax.jit(lambda z: dec.apply(dec_params, z))
    encode = (jax.jit(lambda px: enc.apply(enc_params, px))
              if enc_params is not None else None)
    return encode, decode


# ---------------------------------------------------------------------------
# Text encoders
# ---------------------------------------------------------------------------

TEXT_ENCODER_KINDS = {
    # family -> (subfolder, kind, max_len)
    "wan": [("text_encoder", "umt5", 512)],
    "hunyuan": [("text_encoder", "llama", 256),
                ("text_encoder_2", "clip", 77)],
    "flux": [("text_encoder_2", "t5", 512),
             ("text_encoder", "clip", 77)],
    "cogvideox": [("text_encoder", "t5", 226)],
}


def load_text_encoders(family: str, root: str):
    """List of TransformersTextEncoder for the family's bundled encoders
    (primary first); empty list when the snapshot has none."""
    from .encoders import TransformersTextEncoder
    out = []
    for sub, kind, max_len in TEXT_ENCODER_KINDS[family]:
        d = _subdir(root, sub)
        if d is None:
            continue
        enc = TransformersTextEncoder(d, max_len, kind)
        tok = (_subdir(root, "tokenizer_2")
               if sub.endswith("_2") else _subdir(root, "tokenizer"))
        if tok is not None:
            enc.tokenizer_dir = tok
        out.append(enc)
    return out

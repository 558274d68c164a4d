"""Checkpoint loading: HF safetensors state dicts → flax param pytrees.

The reference consumes read-only HF snapshots through diffusers
``from_pretrained`` (scripts/main_hunyuan.py:233-238); here weights are
mapped tensor-by-tensor into the flax modules.  ``load_safetensors_dir``
reads a local snapshot directory (no network); ``convert_*`` functions
perform the name/layout mapping.

Layout conventions:
  * torch nn.Linear weight [out, in]  →  flax Dense kernel [in, out] (T)
  * torch conv3d patch embed [out, in, kt, kh, kw] → flattened Dense
    kernel [(kt*kh*kw*in), out] matching models/*._patchify token layout
    (channels last within a patch: reshape + transpose below)
  * RMSNorm weight → {"scale": w}; LayerNorm → {"scale": w, "bias": b}
"""

from __future__ import annotations

import os
import re
from typing import Callable

import numpy as np


def load_safetensors_dir(path: str, pattern: str = r".*\.safetensors$") -> dict:
    """Read every safetensors shard in a directory into one numpy dict."""
    try:
        from safetensors import safe_open
    except ImportError:
        from safetensors.numpy import load_file  # noqa: F401
        raise
    out = {}
    for fname in sorted(os.listdir(path)):
        if not re.match(pattern, fname):
            continue
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                out[key] = f.get_tensor(key)
    return out


def _dense(w, b=None):
    p = {"kernel": np.ascontiguousarray(np.asarray(w).T)}
    if b is not None:
        p["bias"] = np.asarray(b)
    return p


def _ln(sd, prefix):
    p = {}
    if prefix + ".weight" in sd:
        p["scale"] = np.asarray(sd[prefix + ".weight"])
    if prefix + ".bias" in sd:
        p["bias"] = np.asarray(sd[prefix + ".bias"])
    return p


def _rms(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"])}


def _patch_embed_conv_to_dense(w, b):
    """[out, in, kt, kh, kw] conv → Dense kernel matching _patchify's
    token feature order (pt, p, p, C) flattened."""
    w = np.asarray(w)
    out_ch, in_ch, kt, kh, kw = w.shape
    # token features are ordered (kt, kh, kw, in_ch); conv weight dims are
    # (out, in, kt, kh, kw) → permute to (kt, kh, kw, in, out) and flatten
    k = w.transpose(2, 3, 4, 1, 0).reshape(kt * kh * kw * in_ch, out_ch)
    return {"kernel": np.ascontiguousarray(k),
            "bias": np.asarray(b)}


def convert_wan(sd: dict, num_blocks: int) -> dict:
    """diffusers WanTransformer3DModel → WanDiT params."""
    p: dict = {}
    p["patch_embedding"] = _patch_embed_conv_to_dense(
        sd["patch_embedding.weight"], sd["patch_embedding.bias"])
    p["text_embedder"] = {
        "fc1": _dense(sd["condition_embedder.text_embedder.linear_1.weight"],
                      sd["condition_embedder.text_embedder.linear_1.bias"]),
        "fc2": _dense(sd["condition_embedder.text_embedder.linear_2.weight"],
                      sd["condition_embedder.text_embedder.linear_2.bias"]),
    }
    # our time path is time_in -> MLP(fc1, silu, fc2); fold diffusers'
    # (linear_1, silu, linear_2) as time_in=linear_1, fc1=identity,
    # fc2=linear_2 so the activation lands between the two real linears
    p["time_in"] = _dense(
        sd["condition_embedder.time_embedder.linear_1.weight"],
        sd["condition_embedder.time_embedder.linear_1.bias"])
    hid = sd["condition_embedder.time_embedder.linear_2.weight"].shape[0]
    p["time_embedder"] = {
        "fc1": _identity_dense(
            sd["condition_embedder.time_embedder.linear_2.weight"].shape[1]),
        "fc2": _dense(sd["condition_embedder.time_embedder.linear_2.weight"],
                      sd["condition_embedder.time_embedder.linear_2.bias"]),
    }
    p["time_proj"] = _dense(sd["condition_embedder.time_proj.weight"],
                            sd["condition_embedder.time_proj.bias"])
    if "condition_embedder.image_embedder.norm1.weight" in sd:  # I2V
        ie = "condition_embedder.image_embedder"
        p["img_norm1"] = _ln(sd, f"{ie}.norm1")
        p["img_ff"] = {
            "fc1": _dense(sd[f"{ie}.ff.net.0.proj.weight"],
                          sd[f"{ie}.ff.net.0.proj.bias"]),
            "fc2": _dense(sd[f"{ie}.ff.net.2.weight"],
                          sd[f"{ie}.ff.net.2.bias"])}
        p["img_norm2"] = _ln(sd, f"{ie}.norm2")
    for i in range(num_blocks):
        b = f"blocks.{i}"
        blk = {
            "scale_shift_table": np.asarray(sd[f"{b}.scale_shift_table"])[None]
            if sd[f"{b}.scale_shift_table"].ndim == 2
            else np.asarray(sd[f"{b}.scale_shift_table"]),
            "attn1_to_q": _dense(sd[f"{b}.attn1.to_q.weight"],
                                 sd[f"{b}.attn1.to_q.bias"]),
            "attn1_to_k": _dense(sd[f"{b}.attn1.to_k.weight"],
                                 sd[f"{b}.attn1.to_k.bias"]),
            "attn1_to_v": _dense(sd[f"{b}.attn1.to_v.weight"],
                                 sd[f"{b}.attn1.to_v.bias"]),
            "attn1_to_out": _dense(sd[f"{b}.attn1.to_out.0.weight"],
                                   sd[f"{b}.attn1.to_out.0.bias"]),
            "attn1_norm_q": _rms(sd, f"{b}.attn1.norm_q"),
            "attn1_norm_k": _rms(sd, f"{b}.attn1.norm_k"),
            "attn2_to_q": _dense(sd[f"{b}.attn2.to_q.weight"],
                                 sd[f"{b}.attn2.to_q.bias"]),
            "attn2_to_k": _dense(sd[f"{b}.attn2.to_k.weight"],
                                 sd[f"{b}.attn2.to_k.bias"]),
            "attn2_to_v": _dense(sd[f"{b}.attn2.to_v.weight"],
                                 sd[f"{b}.attn2.to_v.bias"]),
            "attn2_to_out": _dense(sd[f"{b}.attn2.to_out.0.weight"],
                                   sd[f"{b}.attn2.to_out.0.bias"]),
            "attn2_norm_q": _rms(sd, f"{b}.attn2.norm_q"),
            "attn2_norm_k": _rms(sd, f"{b}.attn2.norm_k"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "ffn": {"fc1": _dense(sd[f"{b}.ffn.net.0.proj.weight"],
                                  sd[f"{b}.ffn.net.0.proj.bias"]),
                    "fc2": _dense(sd[f"{b}.ffn.net.2.weight"],
                                  sd[f"{b}.ffn.net.2.bias"])},
        }
        if f"{b}.attn2.add_k_proj.weight" in sd:   # I2V image branch
            blk["attn2_add_k_proj"] = _dense(sd[f"{b}.attn2.add_k_proj.weight"],
                                             sd[f"{b}.attn2.add_k_proj.bias"])
            blk["attn2_add_v_proj"] = _dense(sd[f"{b}.attn2.add_v_proj.weight"],
                                             sd[f"{b}.attn2.add_v_proj.bias"])
            blk["attn2_norm_added_k"] = _rms(sd, f"{b}.attn2.norm_added_k")
        p[f"block_{i}"] = blk
    p["scale_shift_table_out"] = np.asarray(sd["scale_shift_table"])[None] \
        if sd["scale_shift_table"].ndim == 2 else np.asarray(sd["scale_shift_table"])
    p["proj_out"] = _dense(sd["proj_out.weight"], sd["proj_out.bias"])
    return {"params": p}


def _identity_dense(dim: int):
    return {"kernel": np.eye(dim, dtype=np.float32),
            "bias": np.zeros(dim, np.float32)}


def _flux_embedders(sd: dict) -> dict:
    """The Flux trunk's shared conditioning embedders (x/context/time/
    pooled/guidance) — identical keys in FluxTransformer2DModel and
    FluxControlNetModel state dicts."""
    p: dict = {}
    p["x_embedder"] = _dense(sd["x_embedder.weight"], sd["x_embedder.bias"])
    p["context_embedder"] = _dense(sd["context_embedder.weight"],
                                   sd["context_embedder.bias"])
    te = "time_text_embed.timestep_embedder"
    p["time_in"] = _dense(sd[f"{te}.linear_1.weight"],
                          sd[f"{te}.linear_1.bias"])
    p["time_mlp"] = {"fc1": _identity_dense(sd[f"{te}.linear_2.weight"].shape[1]),
                     "fc2": _dense(sd[f"{te}.linear_2.weight"],
                                   sd[f"{te}.linear_2.bias"])}
    pe = "time_text_embed.text_embedder"
    p["pooled_in"] = _dense(sd[f"{pe}.linear_1.weight"],
                            sd[f"{pe}.linear_1.bias"])
    p["pooled_mlp"] = {"fc1": _identity_dense(sd[f"{pe}.linear_2.weight"].shape[1]),
                       "fc2": _dense(sd[f"{pe}.linear_2.weight"],
                                     sd[f"{pe}.linear_2.bias"])}
    ge = "time_text_embed.guidance_embedder"
    if f"{ge}.linear_1.weight" in sd:
        p["guide_in"] = _dense(sd[f"{ge}.linear_1.weight"],
                               sd[f"{ge}.linear_1.bias"])
        p["guide_mlp"] = {
            "fc1": _identity_dense(sd[f"{ge}.linear_2.weight"].shape[1]),
            "fc2": _dense(sd[f"{ge}.linear_2.weight"],
                          sd[f"{ge}.linear_2.bias"])}
    return p


def convert_flux(sd: dict, num_dual: int, num_single: int) -> dict:
    """diffusers FluxTransformer2DModel → FluxDiT params (core blocks;
    conditioning embedders are mapped with identity-folding where our
    module structure fuses adjacent Linears)."""
    p = _flux_embedders(sd)

    for i in range(num_dual):
        p[f"dual_{i}"] = _flux_dual_block(sd, f"transformer_blocks.{i}")
    for i in range(num_single):
        p[f"single_{i}"] = _flux_single_block(
            sd, f"single_transformer_blocks.{i}")
    p["norm_out"] = {"linear": _dense(sd["norm_out.linear.weight"],
                                      sd["norm_out.linear.bias"])}
    p["proj_out"] = _dense(sd["proj_out.weight"], sd["proj_out.bias"])
    return {"params": p}


def _flux_dual_block(sd: dict, b: str) -> dict:
    return {
        "norm1": {"linear": _dense(sd[f"{b}.norm1.linear.weight"],
                                   sd[f"{b}.norm1.linear.bias"])},
        "norm1_context": {"linear": _dense(
            sd[f"{b}.norm1_context.linear.weight"],
            sd[f"{b}.norm1_context.linear.bias"])},
        "attn": {
            "to_q": _dense(sd[f"{b}.attn.to_q.weight"],
                           sd[f"{b}.attn.to_q.bias"]),
            "to_k": _dense(sd[f"{b}.attn.to_k.weight"],
                           sd[f"{b}.attn.to_k.bias"]),
            "to_v": _dense(sd[f"{b}.attn.to_v.weight"],
                           sd[f"{b}.attn.to_v.bias"]),
            "add_to_q": _dense(sd[f"{b}.attn.add_q_proj.weight"],
                               sd[f"{b}.attn.add_q_proj.bias"]),
            "add_to_k": _dense(sd[f"{b}.attn.add_k_proj.weight"],
                               sd[f"{b}.attn.add_k_proj.bias"]),
            "add_to_v": _dense(sd[f"{b}.attn.add_v_proj.weight"],
                               sd[f"{b}.attn.add_v_proj.bias"]),
            "norm_q": _rms(sd, f"{b}.attn.norm_q"),
            "norm_k": _rms(sd, f"{b}.attn.norm_k"),
            "norm_added_q": _rms(sd, f"{b}.attn.norm_added_q"),
            "norm_added_k": _rms(sd, f"{b}.attn.norm_added_k"),
            "to_out": _dense(sd[f"{b}.attn.to_out.0.weight"],
                             sd[f"{b}.attn.to_out.0.bias"]),
            "to_add_out": _dense(sd[f"{b}.attn.to_add_out.weight"],
                                 sd[f"{b}.attn.to_add_out.bias"]),
        },
        "ff": {"fc1": _dense(sd[f"{b}.ff.net.0.proj.weight"],
                             sd[f"{b}.ff.net.0.proj.bias"]),
               "fc2": _dense(sd[f"{b}.ff.net.2.weight"],
                             sd[f"{b}.ff.net.2.bias"])},
        "ff_context": {
            "fc1": _dense(sd[f"{b}.ff_context.net.0.proj.weight"],
                          sd[f"{b}.ff_context.net.0.proj.bias"]),
            "fc2": _dense(sd[f"{b}.ff_context.net.2.weight"],
                          sd[f"{b}.ff_context.net.2.bias"])},
    }


def _flux_single_block(sd: dict, b: str) -> dict:
    # diffusers single block: separate to_q/to_k/to_v + proj_mlp, fused
    # output proj_out over [attn ; mlp]
    wq, wk, wv = (sd[f"{b}.attn.to_q.weight"], sd[f"{b}.attn.to_k.weight"],
                  sd[f"{b}.attn.to_v.weight"])
    bq, bk, bv = (sd[f"{b}.attn.to_q.bias"], sd[f"{b}.attn.to_k.bias"],
                  sd[f"{b}.attn.to_v.bias"])
    return {
        "norm": {"linear": _dense(sd[f"{b}.norm.linear.weight"],
                                  sd[f"{b}.norm.linear.bias"])},
        "to_qkv": _dense(np.concatenate([wq, wk, wv], axis=0),
                         np.concatenate([bq, bk, bv], axis=0)),
        "norm_q": _rms(sd, f"{b}.attn.norm_q"),
        "norm_k": _rms(sd, f"{b}.attn.norm_k"),
        "proj_mlp": _dense(sd[f"{b}.proj_mlp.weight"],
                           sd[f"{b}.proj_mlp.bias"]),
        "proj_out": _dense(sd[f"{b}.proj_out.weight"],
                           sd[f"{b}.proj_out.bias"]),
    }


def convert_flux_controlnet(sd: dict, num_dual: int, num_single: int) -> dict:
    """diffusers FluxControlNetModel → FluxControlNet params (the jasperai
    Flux.1-dev-Controlnet-Upscaler layout: the Flux embedders + a
    truncated dual-stream trunk + zero-init controlnet_x_embedder and
    per-block output projections; reference loads it at
    scripts/main_upflux.py:308-311 and consumes its residual samples at
    main_upflux.py:163-172)."""
    p = _flux_embedders(sd)
    p["controlnet_x_embedder"] = _dense(sd["controlnet_x_embedder.weight"],
                                        sd["controlnet_x_embedder.bias"])
    for i in range(num_dual):
        p[f"dual_{i}"] = _flux_dual_block(sd, f"transformer_blocks.{i}")
        p[f"cn_proj_{i}"] = _dense(sd[f"controlnet_blocks.{i}.weight"],
                                   sd[f"controlnet_blocks.{i}.bias"])
    for i in range(num_single):
        p[f"single_{i}"] = _flux_single_block(
            sd, f"single_transformer_blocks.{i}")
        p[f"cn_single_proj_{i}"] = _dense(
            sd[f"controlnet_single_blocks.{i}.weight"],
            sd[f"controlnet_single_blocks.{i}.bias"])
    return {"params": p}


def _folded_embedder(sd, prefix):
    """diffusers TimestepEmbedding (linear_1, silu, linear_2) → our
    (Dense in, MLP(fc1=identity, silu, fc2=linear_2)) pair."""
    lin_in = _dense(sd[f"{prefix}.linear_1.weight"],
                    sd[f"{prefix}.linear_1.bias"])
    mlp = {"fc1": _identity_dense(sd[f"{prefix}.linear_2.weight"].shape[1]),
           "fc2": _dense(sd[f"{prefix}.linear_2.weight"],
                         sd[f"{prefix}.linear_2.bias"])}
    return lin_in, mlp


def convert_hunyuan(sd: dict, num_dual: int, num_single: int,
                    num_refiner: int = 2, pooled_dim: int = 768,
                    text_dim: int = 4096) -> dict:
    """diffusers HunyuanVideoTransformer3DModel → HunyuanVideoDiT params."""
    p: dict = {}
    p["x_embedder"] = _patch_embed_conv_to_dense(
        sd["x_embedder.proj.weight"], sd["x_embedder.proj.bias"])

    p["time_in"], p["time_mlp"] = _folded_embedder(
        sd, "time_text_embed.timestep_embedder")
    p["pooled_in"], p["pooled_mlp"] = _folded_embedder(
        sd, "time_text_embed.text_embedder")
    if "time_text_embed.guidance_embedder.linear_1.weight" in sd:
        p["guide_in"], p["guide_mlp"] = _folded_embedder(
            sd, "time_text_embed.guidance_embedder")
    # stand-in projection for synthesised pooled input (unused when the
    # real CLIP pooled vector is passed; has no checkpoint counterpart)
    p["clip_pool_proj"] = {
        "kernel": np.zeros((text_dim, pooled_dim), np.float32),
        "bias": np.zeros(pooled_dim, np.float32)}

    # token refiner
    ce = "context_embedder"
    r: dict = {}
    r["proj_in"] = _dense(sd[f"{ce}.proj_in.weight"],
                          sd[f"{ce}.proj_in.bias"])
    r["time_in"], r["time_mlp"] = _folded_embedder(
        sd, f"{ce}.time_text_embed.timestep_embedder")
    r["pool_in"], r["pool_mlp"] = _folded_embedder(
        sd, f"{ce}.time_text_embed.text_embedder")
    for i in range(num_refiner):
        b = f"{ce}.token_refiner.refiner_blocks.{i}"
        wq, wk, wv = (sd[f"{b}.attn.to_q.weight"],
                      sd[f"{b}.attn.to_k.weight"],
                      sd[f"{b}.attn.to_v.weight"])
        bq, bk, bv = (sd[f"{b}.attn.to_q.bias"], sd[f"{b}.attn.to_k.bias"],
                      sd[f"{b}.attn.to_v.bias"])
        r[f"blk{i}_norm1"] = _ln(sd, f"{b}.norm1")
        r[f"blk{i}_qkv"] = _dense(np.concatenate([wq, wk, wv], 0),
                                  np.concatenate([bq, bk, bv], 0))
        r[f"blk{i}_proj"] = _dense(sd[f"{b}.attn.to_out.0.weight"],
                                   sd[f"{b}.attn.to_out.0.bias"])
        r[f"blk{i}_norm2"] = _ln(sd, f"{b}.norm2")
        r[f"blk{i}_mlp"] = {
            "fc1": _dense(sd[f"{b}.ff.net.0.proj.weight"],
                          sd[f"{b}.ff.net.0.proj.bias"]),
            "fc2": _dense(sd[f"{b}.ff.net.2.weight"],
                          sd[f"{b}.ff.net.2.bias"])}
        r[f"blk{i}_ada"] = _dense(sd[f"{b}.norm_out.linear.weight"],
                                  sd[f"{b}.norm_out.linear.bias"])
    p["context_embedder"] = r

    for i in range(num_dual):
        b = f"transformer_blocks.{i}"
        p[f"dual_{i}"] = {
            "norm1": {"linear": _dense(sd[f"{b}.norm1.linear.weight"],
                                       sd[f"{b}.norm1.linear.bias"])},
            "norm1_context": {"linear": _dense(
                sd[f"{b}.norm1_context.linear.weight"],
                sd[f"{b}.norm1_context.linear.bias"])},
            "attn": {
                "to_q": _dense(sd[f"{b}.attn.to_q.weight"],
                               sd[f"{b}.attn.to_q.bias"]),
                "to_k": _dense(sd[f"{b}.attn.to_k.weight"],
                               sd[f"{b}.attn.to_k.bias"]),
                "to_v": _dense(sd[f"{b}.attn.to_v.weight"],
                               sd[f"{b}.attn.to_v.bias"]),
                "add_to_q": _dense(sd[f"{b}.attn.add_q_proj.weight"],
                                   sd[f"{b}.attn.add_q_proj.bias"]),
                "add_to_k": _dense(sd[f"{b}.attn.add_k_proj.weight"],
                                   sd[f"{b}.attn.add_k_proj.bias"]),
                "add_to_v": _dense(sd[f"{b}.attn.add_v_proj.weight"],
                                   sd[f"{b}.attn.add_v_proj.bias"]),
                "norm_q": _rms(sd, f"{b}.attn.norm_q"),
                "norm_k": _rms(sd, f"{b}.attn.norm_k"),
                "norm_added_q": _rms(sd, f"{b}.attn.norm_added_q"),
                "norm_added_k": _rms(sd, f"{b}.attn.norm_added_k"),
                "to_out": _dense(sd[f"{b}.attn.to_out.0.weight"],
                                 sd[f"{b}.attn.to_out.0.bias"]),
                "to_add_out": _dense(sd[f"{b}.attn.to_add_out.weight"],
                                     sd[f"{b}.attn.to_add_out.bias"]),
            },
            "ff": {"fc1": _dense(sd[f"{b}.ff.net.0.proj.weight"],
                                 sd[f"{b}.ff.net.0.proj.bias"]),
                   "fc2": _dense(sd[f"{b}.ff.net.2.weight"],
                                 sd[f"{b}.ff.net.2.bias"])},
            "ff_context": {
                "fc1": _dense(sd[f"{b}.ff_context.net.0.proj.weight"],
                              sd[f"{b}.ff_context.net.0.proj.bias"]),
                "fc2": _dense(sd[f"{b}.ff_context.net.2.weight"],
                              sd[f"{b}.ff_context.net.2.bias"])},
        }
    for i in range(num_single):
        b = f"single_transformer_blocks.{i}"
        wq, wk, wv = (sd[f"{b}.attn.to_q.weight"], sd[f"{b}.attn.to_k.weight"],
                      sd[f"{b}.attn.to_v.weight"])
        bq, bk, bv = (sd[f"{b}.attn.to_q.bias"], sd[f"{b}.attn.to_k.bias"],
                      sd[f"{b}.attn.to_v.bias"])
        p[f"single_{i}"] = {
            "norm": {"linear": _dense(sd[f"{b}.norm.linear.weight"],
                                      sd[f"{b}.norm.linear.bias"])},
            "to_qkv": _dense(np.concatenate([wq, wk, wv], axis=0),
                             np.concatenate([bq, bk, bv], axis=0)),
            "norm_q": _rms(sd, f"{b}.attn.norm_q"),
            "norm_k": _rms(sd, f"{b}.attn.norm_k"),
            "proj_mlp": _dense(sd[f"{b}.proj_mlp.weight"],
                               sd[f"{b}.proj_mlp.bias"]),
            "proj_out": _dense(sd[f"{b}.proj_out.weight"],
                               sd[f"{b}.proj_out.bias"]),
        }
    p["norm_out"] = {"linear": _dense(sd["norm_out.linear.weight"],
                                      sd["norm_out.linear.bias"])}
    p["proj_out"] = _dense(sd["proj_out.weight"], sd["proj_out.bias"])
    return {"params": p}


def convert_cogvideox(sd: dict, num_blocks: int,
                      use_ofs: bool = True, patch_size_t: int = 2,
                      patch_size: int = 2) -> dict:
    """diffusers CogVideoXTransformer3DModel (1.5: Linear patch embed) →
    CogVideoXDiT params.

    Patchify feature order (the round-2 documented risk, now resolved):
    diffusers packs token features CHANNEL-MAJOR — (C, p_t, p, p) — as
    proven by the reference's own forked unpatchify
    (scripts/main_cogvideox.py:173-180: ``reshape(B, T', H', W', -1,
    p_t, p, p)`` with C at dim 4) and diffusers' CogVideoXPatchEmbed
    using the matching order on the input side.  Our ``_patchify`` /
    ``_unpatchify`` are (p_t, p, p, C) — channel-LAST (so the Conv
    weights of the 1.0 path map without a transpose) — hence the 1.5
    Linear patch_embed's input features and proj_out's output features
    are permuted here (tests/test_weights.py::
    test_cogvideox_patchify_feature_order pins both against a
    transliteration of the reference's unpatchify lines)."""
    p: dict = {}
    pt, ps = patch_size_t, patch_size
    w = np.asarray(sd["patch_embed.proj.weight"])
    if w.ndim == 2:        # 1.5 Linear patchify
        hid, fin = w.shape
        ch = fin // (pt * ps * ps)
        # input features: diffusers (C, pt, ph, pw) -> ours (pt, ph, pw, C)
        wr = w.reshape(hid, ch, pt, ps, ps).transpose(0, 2, 3, 4, 1)
        p["patch_embed"] = _dense(wr.reshape(hid, fin),
                                  sd["patch_embed.proj.bias"])
    else:                  # 1.0 Conv2d [out, in, p, p] per frame
        out_ch, in_ch, ph, pw = w.shape
        k = w.transpose(2, 3, 1, 0).reshape(ph * pw * in_ch, out_ch)
        p["patch_embed"] = {"kernel": np.ascontiguousarray(k),
                           "bias": np.asarray(sd["patch_embed.proj.bias"])}
    p["text_proj"] = _dense(sd["patch_embed.text_proj.weight"],
                            sd["patch_embed.text_proj.bias"])
    p["time_in"], p["time_mlp"] = _folded_embedder(sd, "time_embedding")
    if use_ofs and "ofs_embedding.linear_1.weight" in sd:
        p["ofs_in"], p["ofs_mlp"] = _folded_embedder(sd, "ofs_embedding")
    for i in range(num_blocks):
        b = f"transformer_blocks.{i}"
        p[f"block_{i}"] = {
            "norm1_lin": _dense(sd[f"{b}.norm1.linear.weight"],
                                sd[f"{b}.norm1.linear.bias"]),
            "norm1_ln": _ln(sd, f"{b}.norm1.norm"),
            "to_q": _dense(sd[f"{b}.attn1.to_q.weight"],
                           sd[f"{b}.attn1.to_q.bias"]),
            "to_k": _dense(sd[f"{b}.attn1.to_k.weight"],
                           sd[f"{b}.attn1.to_k.bias"]),
            "to_v": _dense(sd[f"{b}.attn1.to_v.weight"],
                           sd[f"{b}.attn1.to_v.bias"]),
            "norm_q": _ln(sd, f"{b}.attn1.norm_q"),
            "norm_k": _ln(sd, f"{b}.attn1.norm_k"),
            "to_out": _dense(sd[f"{b}.attn1.to_out.0.weight"],
                             sd[f"{b}.attn1.to_out.0.bias"]),
            "norm2_lin": _dense(sd[f"{b}.norm2.linear.weight"],
                                sd[f"{b}.norm2.linear.bias"]),
            "norm2_ln": _ln(sd, f"{b}.norm2.norm"),
            "ff": {"fc1": _dense(sd[f"{b}.ff.net.0.proj.weight"],
                                 sd[f"{b}.ff.net.0.proj.bias"]),
                   "fc2": _dense(sd[f"{b}.ff.net.2.weight"],
                                 sd[f"{b}.ff.net.2.bias"])},
        }
    p["norm_final"] = _ln(sd, "norm_final")
    p["norm_out_lin"] = _dense(sd["norm_out.linear.weight"],
                               sd["norm_out.linear.bias"])
    p["norm_out_ln"] = _ln(sd, "norm_out.norm")
    # output features: diffusers (C, pt, ph, pw) -> ours (pt, ph, pw, C)
    # (1.0 path: pt == 1, same transform with a singleton axis)
    wo = np.asarray(sd["proj_out.weight"])
    bo = np.asarray(sd["proj_out.bias"])
    fout, hid = wo.shape
    och = fout // (pt * ps * ps)
    wo = wo.reshape(och, pt, ps, ps, hid).transpose(1, 2, 3, 0, 4)
    bo = bo.reshape(och, pt, ps, ps).transpose(1, 2, 3, 0)
    p["proj_out"] = _dense(wo.reshape(fout, hid), bo.reshape(fout))
    return {"params": p}


CONVERTERS: dict[str, Callable] = {
    "wan": convert_wan,
    "flux": convert_flux,
    "flux_controlnet": convert_flux_controlnet,
    "hunyuan": convert_hunyuan,
    "cogvideox": convert_cogvideox,
}


class TrackedStateDict:
    """Mapping wrapper that records every key a converter consumed.

    Missing keys fail loudly through the normal ``KeyError``; after the
    conversion, ``unused`` exposes state-dict keys the converter never
    read — the naming-drift failure mode real checkpoints would hit
    silently (reference loads whole snapshots via ``from_pretrained``,
    scripts/main_hunyuan.py:233-238, where an unconsumed tensor means a
    wrong name on our side)."""

    def __init__(self, sd: dict):
        self._sd = sd
        self.used: set = set()

    def __getitem__(self, k):
        v = self._sd[k]
        self.used.add(k)
        return v

    def get(self, k, default=None):
        if k in self._sd:
            return self[k]
        return default

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def keys(self):
        return self._sd.keys()

    @property
    def unused(self) -> set:
        return set(self._sd) - self.used


def convert_strict(family: str, sd: dict, *args, **kwargs) -> dict:
    """Run ``CONVERTERS[family]`` and fail if any state-dict key went
    unconsumed (unknown/renamed keys) — the loud-load contract for real
    checkpoints."""
    tracker = TrackedStateDict(sd)
    out = CONVERTERS[family](tracker, *args, **kwargs)
    if tracker.unused:
        sample = sorted(tracker.unused)[:8]
        raise ValueError(
            f"convert_{family}: {len(tracker.unused)} state-dict keys were "
            f"not consumed (name/layout drift?): {sample}")
    return out


def assign_dtype(params, dtype):
    import jax.numpy as jnp
    import jax
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype) if np.issubdtype(
            np.asarray(x).dtype, np.floating) else jnp.asarray(x), params)


# ---------------------------------------------------------------------------
# VAE converters (diffusers AutoencoderKL / KLHunyuanVideo / KLWan /
# KLCogVideoX family layout: conv_in → mid(resnet, attention, resnet) →
# up/down blocks → conv_norm_out → conv_out, plus optional quant convs)
# ---------------------------------------------------------------------------

def _conv(sd, prefix):
    """torch conv [out, in, *k] → flax Conv kernel [*k, in, out]."""
    w = np.asarray(sd[prefix + ".weight"])
    nd = w.ndim
    perm = tuple(range(2, nd)) + (1, 0)
    p = {"kernel": np.ascontiguousarray(w.transpose(perm))}
    if prefix + ".bias" in sd:
        p["bias"] = np.asarray(sd[prefix + ".bias"])
    return p


def _vae_conv(sd, prefix, video):
    """Our video convs are CausalConv3d modules with a child nn.Conv
    named 'conv'; image convs are bare nn.Conv."""
    c = _conv(sd, prefix)
    return {"conv": c} if video else c


def _vae_resnet(sd, prefix, video):
    p = {
        "norm1": _ln(sd, prefix + ".norm1"),
        "conv1": _vae_conv(sd, prefix + ".conv1", video),
        "norm2": _ln(sd, prefix + ".norm2"),
        "conv2": _vae_conv(sd, prefix + ".conv2", video),
    }
    if prefix + ".conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _vae_conv(sd, prefix + ".conv_shortcut", video)
    return p


def _vae_mid(sd, prefix, video, p):
    p["mid_res1"] = _vae_resnet(sd, prefix + ".resnets.0", video)
    p["mid_res2"] = _vae_resnet(sd, prefix + ".resnets.1", video)
    attn = prefix + ".attentions.0"
    if attn + ".to_q.weight" in sd:
        p["mid_attn"] = {
            "group_norm": _ln(sd, attn + ".group_norm"),
            "to_q": _dense(sd[attn + ".to_q.weight"],
                           sd.get(attn + ".to_q.bias")),
            "to_k": _dense(sd[attn + ".to_k.weight"],
                           sd.get(attn + ".to_k.bias")),
            "to_v": _dense(sd[attn + ".to_v.weight"],
                           sd.get(attn + ".to_v.bias")),
            "to_out": _dense(sd[attn + ".to_out.0.weight"],
                             sd.get(attn + ".to_out.0.bias")),
        }
    return p


def convert_vae_decoder(sd: dict, num_up_blocks: int, layers_per_block: int,
                        video: bool = True) -> dict:
    """diffusers VAE ``decoder.*`` keys → VAEDecoder params.

    Decoder up-blocks carry layers_per_block + 1 resnets (diffusers
    UpDecoderBlock convention).  Reference pipelines load these VAEs via
    ``from_pretrained`` (scripts/main_hunyuan.py:233-238)."""
    p: dict = {"conv_in": _vae_conv(sd, "decoder.conv_in", video)}
    _vae_mid(sd, "decoder.mid_block", video, p)
    for i in range(num_up_blocks):
        for j in range(layers_per_block + 1):
            p[f"up{i}_res{j}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", video)
        up = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if up + ".weight" in sd:
            p[f"up{i}_conv"] = _vae_conv(sd, up, video)
    p["norm_out"] = _ln(sd, "decoder.conv_norm_out")
    p["conv_out"] = _vae_conv(sd, "decoder.conv_out", video)
    if "post_quant_conv.weight" in sd:
        p["post_quant_conv"] = _conv(sd, "post_quant_conv")
    return {"params": p}


def convert_vae_encoder(sd: dict, num_down_blocks: int,
                        layers_per_block: int, video: bool = True) -> dict:
    """diffusers VAE ``encoder.*`` keys → VAEEncoder params."""
    p: dict = {"conv_in": _vae_conv(sd, "encoder.conv_in", video)}
    for i in range(num_down_blocks):
        for j in range(layers_per_block):
            p[f"down{i}_res{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", video)
        dn = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if dn + ".weight" in sd:
            p[f"down{i}_down"] = {"conv": _conv(sd, dn)}
    _vae_mid(sd, "encoder.mid_block", video, p)
    p["norm_out"] = _ln(sd, "encoder.conv_norm_out")
    p["conv_out"] = _vae_conv(sd, "encoder.conv_out", video)
    if "quant_conv.weight" in sd:
        p["quant_conv"] = _conv(sd, "quant_conv")
    return {"params": p}

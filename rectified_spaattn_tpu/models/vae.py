"""Latent VAE decoders (flax) — the pixel end of every pipeline.

The reference uses diffusers VAEs (AutoencoderKLHunyuanVideo /
AutoencoderKLWan / AutoencoderKLCogVideoX / AutoencoderKL; loaded inside
``from_pretrained``, scripts/main_hunyuan.py:234).  This module provides a
TPU-native causal-3D video decoder and a 2-D image decoder sharing the
same resnet/upsample skeleton, plus spatial tiling for 4k-class decodes
(the reference calls ``vae.enable_tiling()``, main_hunyuan.py:236).

The structure matches the common diffusers decoder recipe (conv_in →
mid(resnet, resnet) → up blocks with resnets + upsamples → norm_out →
conv_out) so checkpoint weights map 1:1; exact per-family variant quirks
are handled by ``VAEConfig``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 16
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    temporal_upsample: tuple = (False, True, True, False)  # per up-block
    spatial_upsample: tuple = (True, True, True, False)
    causal: bool = True            # causal temporal convs (video VAEs)
    video: bool = True             # 5-D [B,C,T,H,W] vs 4-D [B,C,H,W]
    mid_attention: bool = True     # spatial self-attn in the mid block
                                   # (every diffusers family in scope has it)
    quant_conv: bool = False       # AutoencoderKL 1x1 (post_)quant_conv
    scaling_factor: float = 0.476986
    # scalar latent shift applied before scaling (Flux AutoencoderKL:
    # z = (raw - shift) * scale; 0 for every video family)
    shift_factor: float = 0.0
    # per-channel latent normalisation (AutoencoderKLWan latents_mean/std;
    # None = scalar scaling_factor only)
    latents_mean: tuple | None = None
    latents_std: tuple | None = None

    @classmethod
    def tiny(cls, video=True, **kw):
        kw.setdefault("mid_attention", False)
        return cls(latent_channels=4, block_out_channels=(8, 16),
                   layers_per_block=1, temporal_upsample=(True, False),
                   spatial_upsample=(True, False), video=video, **kw)


def normalize_latents(z, cfg: VAEConfig):
    """Raw encoder output → model latent space (diffusers: subtract
    latents_mean, multiply by 1/latents_std, or multiply scaling_factor)."""
    if cfg.latents_mean is not None:
        mean = jnp.asarray(cfg.latents_mean).reshape(
            1, -1, *([1] * (z.ndim - 2)))
        std = jnp.asarray(cfg.latents_std).reshape(
            1, -1, *([1] * (z.ndim - 2)))
        return (z - mean) / std
    return (z - cfg.shift_factor) * cfg.scaling_factor


def denormalize_latents(z, cfg: VAEConfig):
    if cfg.latents_mean is not None:
        mean = jnp.asarray(cfg.latents_mean).reshape(
            1, -1, *([1] * (z.ndim - 2)))
        std = jnp.asarray(cfg.latents_std).reshape(
            1, -1, *([1] * (z.ndim - 2)))
        return z * std + mean
    return z / cfg.scaling_factor + cfg.shift_factor


class CausalConv3d(nn.Module):
    """3-D conv with causal temporal padding (video frames only see the
    past) and SAME spatial padding."""
    features: int
    kernel: tuple = (3, 3, 3)
    causal: bool = True

    @nn.compact
    def __call__(self, x):                      # [B, T, H, W, C]
        kt, kh, kw = self.kernel
        pad_t = (kt - 1, 0) if self.causal else ((kt - 1) // 2, kt // 2)
        x = jnp.pad(x, ((0, 0), pad_t, ((kh - 1) // 2, kh // 2),
                        ((kw - 1) // 2, kw // 2), (0, 0)),
                    mode="edge" if self.causal else "constant")
        return nn.Conv(self.features, self.kernel, padding="VALID",
                       name="conv")(x)


class ResnetBlock(nn.Module):
    features: int
    video: bool
    causal: bool

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), name="norm1")(x)
        h = nn.silu(h)
        h = self._conv("conv1")(h)
        h = nn.GroupNorm(num_groups=min(32, self.features), name="norm2")(h)
        h = nn.silu(h)
        h = self._conv("conv2")(h)
        if x.shape[-1] != self.features:
            x = self._conv("conv_shortcut", kernel=1)(x)
        return x + h

    def _conv(self, name, kernel=3):
        if self.video:
            return CausalConv3d(self.features, (kernel,) * 3,
                                causal=self.causal, name=name)
        return nn.Conv(self.features, (kernel, kernel), padding="SAME",
                       name=name)


class MidAttention(nn.Module):
    """Single-head spatial self-attention over each frame — the diffusers
    mid-block Attention every VAE family in scope carries
    (AutoencoderKL / KLHunyuanVideo / KLWan mid_block.attentions[0])."""
    features: int

    @nn.compact
    def __call__(self, x):              # [..., H, W, C] (frames batched)
        lead = x.shape[:-3]
        hh, ww, cc = x.shape[-3:]
        h = nn.GroupNorm(num_groups=min(32, cc), name="group_norm")(x)
        h = h.reshape(*lead, hh * ww, cc)
        q = nn.Dense(self.features, name="to_q")(h)
        k = nn.Dense(self.features, name="to_k")(h)
        v = nn.Dense(self.features, name="to_v")(h)
        a = jax.nn.softmax(
            jnp.einsum("...qc,...kc->...qk", q, k) * (self.features ** -0.5),
            axis=-1)
        o = jnp.einsum("...qk,...kc->...qc", a, v)
        o = nn.Dense(self.features, name="to_out")(o)
        return x + o.reshape(*lead, hh, ww, cc)


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, latents):
        """latents: [B, C, T, H, W] (video) or [B, C, H, W] (image) →
        pixels in [-1, 1] with the configured up-sampling factors."""
        c = self.cfg
        x = denormalize_latents(latents, c)
        # channels-last internally
        x = jnp.moveaxis(x, 1, -1)
        ch = list(reversed(c.block_out_channels))

        conv = (lambda f, name: CausalConv3d(f, causal=c.causal, name=name)
                ) if c.video else (
                lambda f, name: nn.Conv(f, (3, 3), padding="SAME", name=name))

        if c.quant_conv:
            # AutoencoderKL post_quant_conv: 1x1 over latent channels
            k1 = (1, 1, 1) if c.video else (1, 1)
            x = nn.Conv(c.latent_channels, k1, name="post_quant_conv")(x)
        x = conv(ch[0], "conv_in")(x)
        x = ResnetBlock(ch[0], c.video, c.causal, name="mid_res1")(x)
        if c.mid_attention:
            x = MidAttention(ch[0], name="mid_attn")(x)
        x = ResnetBlock(ch[0], c.video, c.causal, name="mid_res2")(x)

        for i, f in enumerate(ch):
            # diffusers decoder up-blocks carry layers_per_block + 1
            # resnets (UpDecoderBlock2D convention) — kept for 1:1 weights
            for j in range(c.layers_per_block + 1):
                x = ResnetBlock(f, c.video, c.causal,
                                name=f"up{i}_res{j}")(x)
            s_up = c.spatial_upsample[i]
            t_up = c.video and c.temporal_upsample[i]
            if s_up or t_up:
                if c.video:
                    b, t, hh, ww, cc = x.shape
                    rt, rs = (2 if t_up else 1), (2 if s_up else 1)
                    x = jnp.repeat(x, rt, axis=1)
                    x = jnp.repeat(jnp.repeat(x, rs, axis=2), rs, axis=3)
                    if t_up and c.causal:
                        x = x[:, rt - 1:]   # causal: first frame not doubled
                else:
                    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = conv(f, f"up{i}_conv")(x)

        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), name="norm_out")(x)
        x = nn.silu(x)
        x = conv(c.out_channels, "conv_out")(x)
        return jnp.moveaxis(x, -1, 1)


class Downsample(nn.Module):
    """Stride-2 conv downsample; causal temporal stride maps T=2t-1 -> t
    (the exact inverse of the decoder's causal repeat-and-trim)."""
    features: int
    video: bool
    causal: bool
    t_down: bool
    s_down: bool

    @nn.compact
    def __call__(self, x):
        if self.video:
            st = 2 if self.t_down else 1
            ss = 2 if self.s_down else 1
            pad_t = (2, 0) if (self.t_down and self.causal) else (1, 1)
            x = jnp.pad(x, ((0, 0), pad_t if self.t_down else (1, 1),
                            (1, 1), (1, 1), (0, 0)),
                        mode="edge" if self.causal else "constant")
            return nn.Conv(self.features, (3, 3, 3), strides=(st, ss, ss),
                           padding="VALID", name="conv")(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return nn.Conv(self.features, (3, 3), strides=(2, 2),
                       padding="VALID", name="conv")(x)


class VAEEncoder(nn.Module):
    """Pixel → latent encoder, mirror of VAEDecoder (the conditioning spine
    for every image-to-video path: the reference pipelines call
    ``vae.encode(video_condition)`` — diffusers WanImageToVideoPipeline /
    CogVideoXImageToVideoPipeline; driver: main_wan21i2v.py:230-248)."""
    cfg: VAEConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels: [B, C, T, H, W] (video) or [B, C, H, W] in [-1, 1] →
        NORMALISED latents [B, latent_C, t, h, w] (distribution mode)."""
        c = self.cfg
        x = jnp.moveaxis(pixels, 1, -1)
        ch = list(c.block_out_channels)
        n = len(ch)
        conv = (lambda f, name: CausalConv3d(f, causal=c.causal, name=name)
                ) if c.video else (
                lambda f, name: nn.Conv(f, (3, 3), padding="SAME", name=name))

        x = conv(ch[0], "conv_in")(x)
        for i, f in enumerate(ch):
            for j in range(c.layers_per_block):
                x = ResnetBlock(f, c.video, c.causal,
                                name=f"down{i}_res{j}")(x)
            # mirror the decoder: up-block (n-1-i) upsamples these flags
            s_dn = c.spatial_upsample[n - 1 - i]
            t_dn = c.video and c.temporal_upsample[n - 1 - i]
            if s_dn or t_dn:
                x = Downsample(f, c.video, c.causal, t_dn, s_dn,
                               name=f"down{i}_down")(x)

        x = ResnetBlock(ch[-1], c.video, c.causal, name="mid_res1")(x)
        if c.mid_attention:
            x = MidAttention(ch[-1], name="mid_attn")(x)
        x = ResnetBlock(ch[-1], c.video, c.causal, name="mid_res2")(x)

        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), name="norm_out")(x)
        x = nn.silu(x)
        x = conv(2 * c.latent_channels, "conv_out")(x)
        if c.quant_conv:
            k1 = (1, 1, 1) if c.video else (1, 1)
            x = nn.Conv(2 * c.latent_channels, k1, name="quant_conv")(x)
        mean = jnp.moveaxis(x, -1, 1)[:, :c.latent_channels]
        return normalize_latents(mean, c)


def tiled_decode(decoder_apply, latents, tile: int = 32, overlap: int = 4):
    """Spatially tiled decode for large frames (reference:
    pipe.vae.enable_tiling()).  Tiles the last two latent dims, blends
    overlaps linearly."""
    import numpy as np
    spatial_axes = (-2, -1)
    lh, lw = latents.shape[-2], latents.shape[-1]
    if lh <= tile and lw <= tile:
        return decoder_apply(latents)
    step = tile - overlap
    outs = None
    weight = None
    for y0 in range(0, lh, step):
        for x0 in range(0, lw, step):
            y1, x1 = min(y0 + tile, lh), min(x0 + tile, lw)
            part = decoder_apply(latents[..., y0:y1, x0:x1])
            scale_h = part.shape[-2] // (y1 - y0)
            scale_w = part.shape[-1] // (x1 - x0)
            if outs is None:
                full_shape = part.shape[:-2] + (lh * scale_h, lw * scale_w)
                outs = np.zeros(full_shape, np.float32)
                weight = np.zeros(full_shape[-2:], np.float32)
            py0, px0 = y0 * scale_h, x0 * scale_w
            ph, pw = part.shape[-2], part.shape[-1]
            wy = np.minimum(np.arange(ph) + 1,
                            np.arange(ph)[::-1] + 1).clip(max=overlap * scale_h)
            wx = np.minimum(np.arange(pw) + 1,
                            np.arange(pw)[::-1] + 1).clip(max=overlap * scale_w)
            wmask = wy[:, None] * wx[None, :]
            outs[..., py0:py0 + ph, px0:px0 + pw] += np.asarray(part) * wmask
            weight[py0:py0 + ph, px0:px0 + pw] += wmask
    return outs / np.maximum(weight, 1e-8)

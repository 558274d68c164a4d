"""Wan 2.1 / 2.2 DiT backbone in flax (TPU-native re-implementation).

Covers the variants the reference accelerates (SURVEY §2.4):
  * Wan2.1 T2V / I2V (diffusers WanTransformer3DModel): visual-only
    self-attention (sparse site) + dense cross-attention to text, I2V adds
    an image-context cross branch
    (reference: rectified_wan21_attn.py:389-632).
  * Wan2.2 TI2V-5B: same skeleton, VAE stride 32, optional per-token
    timesteps (``ts_seq_len``; reference: scripts/main_wan22ti2v.py:81-96).
  * Wan2.2 A14B T2V/I2V: two full transformers routed by a timestep
    boundary — handled at the pipeline level (pipelines/), the backbone is
    this same module instantiated twice
    (reference: scripts/main_wan22t2v.py:51-61).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .quant import QDense
from .layers import (CrossAttnBlock, MLP, rope_axial_freqs,
                     timestep_embedding, AttnFn)


@dataclasses.dataclass(frozen=True)
class WanConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_dim: int = 5120
    heads: int = 40
    head_dim: int = 128
    num_blocks: int = 40
    ffn_dim: int = 13824
    patch_size: tuple = (1, 2, 2)      # (t, h, w)
    text_dim: int = 4096               # umt5 hidden
    freq_dim: int = 256
    rope_axes_dim: tuple = (44, 42, 42)
    rope_theta: float = 10000.0
    image_cross: bool = False          # I2V image-context branch
    image_dim: int = 1280              # CLIP-vision feature dim (I2V)
    per_token_timesteps: bool = False  # Wan2.2 TI2V
    mlp_chunk: int = 1                 # FFN sequence chunking (peak-HBM
                                       # lever; see layers.MLP.chunk)

    @classmethod
    def tiny(cls, **kw):
        kw.setdefault("image_dim", 16)
        kw.setdefault("in_channels", 4)
        kw.setdefault("out_channels", 4)
        return cls(hidden_dim=64, heads=2,
                   head_dim=32, num_blocks=2, ffn_dim=128, text_dim=32,
                   freq_dim=32, rope_axes_dim=(12, 10, 10), **kw)


class WanDiT(nn.Module):
    cfg: WanConfig

    def setup(self):
        c = self.cfg
        self.patch_embedding = QDense(c.hidden_dim, name="patch_embedding")
        # text_embedder: linear(text_dim->hidden), gelu, linear(hidden->
        # hidden) — diffusers WanTextEmbedder layout
        self.text_embedder = MLP(c.hidden_dim, 1.0, activation="gelu",
                                 name="text_embedder")
        self.time_in = QDense(c.hidden_dim, name="time_in")
        self.time_embedder = MLP(c.hidden_dim, 1.0, activation="silu",
                                 name="time_embedder")
        # shared 6-way modulation projection consumed by every block
        # (diffusers `timestep_proj`; the reference's TeaCache signal when
        # use_ret_steps, scripts/main_wan21t2v.py:103)
        self.time_proj = QDense(6 * c.hidden_dim, name="time_proj")
        if c.image_cross:
            # diffusers WanImageEmbedding: norm1 -> ff(gelu) -> norm2 over
            # the CLIP-vision features
            self.img_norm1 = nn.LayerNorm(epsilon=1e-6, name="img_norm1")
            self.img_ff = MLP(c.hidden_dim, c.image_dim / c.hidden_dim,
                              activation="gelu", name="img_ff")
            self.img_norm2 = nn.LayerNorm(epsilon=1e-6, name="img_norm2")
        self.blocks = [
            CrossAttnBlock(c.hidden_dim, c.heads, c.ffn_dim / c.hidden_dim,
                           image_cross=c.image_cross,
                           mlp_chunk=c.mlp_chunk, name=f"block_{i}")
            for i in range(c.num_blocks)]
        self.scale_shift_out = self.param(
            "scale_shift_table_out", nn.initializers.normal(0.02),
            (1, 2, c.hidden_dim))
        self.norm_out = nn.LayerNorm(use_bias=False, use_scale=False,
                                     epsilon=1e-6, name="norm_out")
        pt, ph, pw = c.patch_size
        self.proj_out = QDense(pt * ph * pw * c.out_channels,
                                 name="proj_out")

    def _patchify(self, latents):
        c = self.cfg
        pt, ph, pw = c.patch_size
        b, ch, t, hh, ww = latents.shape
        x = latents.reshape(b, ch, t // pt, pt, hh // ph, ph, ww // pw, pw)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
        return x.reshape(b, (t // pt) * (hh // ph) * (ww // pw), -1)

    def _unpatchify(self, tokens, t, hh, ww):
        c = self.cfg
        pt, ph, pw = c.patch_size
        b = tokens.shape[0]
        x = tokens.reshape(b, t // pt, hh // ph, ww // pw, pt, ph, pw,
                           c.out_channels)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c.out_channels, t, hh, ww)

    def _rope(self, t, hh, ww, perm):
        c = self.cfg
        pt, ph, pw = c.patch_size
        gt, gh, gw = t // pt, hh // ph, ww // pw
        zz, yy, xx = jnp.meshgrid(jnp.arange(gt), jnp.arange(gh),
                                  jnp.arange(gw), indexing="ij")
        cos, sin = rope_axial_freqs(
            (gt, gh, gw), c.rope_axes_dim,
            (zz.ravel(), yy.ravel(), xx.ravel()), theta=c.rope_theta)
        if perm is not None:
            cos, sin = cos[perm], sin[perm]
        return cos, sin

    def embed(self, latents, timestep, text_emb, hilbert_to_linear,
              image_emb=None):
        """Stage 1.  ``timestep`` is [B] or, with per_token_timesteps,
        [B, Sv] (Wan2.2 TI2V)."""
        c = self.cfg
        b, ch, t, hh, ww = latents.shape
        x = self.patch_embedding(self._patchify(latents))
        ctx = self.text_embedder(text_emb)
        ctx_img = None
        if c.image_cross and image_emb is not None:
            ctx_img = self.img_norm2(self.img_ff(self.img_norm1(image_emb)))

        t_feat = timestep_embedding(timestep, c.freq_dim)     # [B(,S),F]
        temb = self.time_embedder(self.time_in(t_feat))       # [B(,S),C]
        temb6 = self.time_proj(nn.silu(temb))                 # [B(,S),6C]
        temb6 = temb6.reshape(*temb.shape[:-1], 6, c.hidden_dim)
        rope = self._rope(t, hh, ww, hilbert_to_linear)
        if hilbert_to_linear is not None:
            x = jnp.take(x, hilbert_to_linear, axis=1)
            if temb.ndim == 3:
                temb = jnp.take(temb, hilbert_to_linear, axis=1)
                temb6 = jnp.take(temb6, hilbert_to_linear, axis=1)
        return x, ctx, ctx_img, temb, temb6, rope

    def run_blocks(self, x, ctx, ctx_img, temb6, rope,
                   self_attn_fn: AttnFn, cross_attn_fn: AttnFn,
                   attn_fns=None):
        """Stage 2 — the TeaCache-skippable hot loop.  ``attn_fns`` may be a
        per-layer list of self-attention fns (the reference gates warm-up
        layers/steps per processor, rectified_wan21_attn.py:467)."""
        for i, blk in enumerate(self.blocks):
            fn = attn_fns[i] if attn_fns is not None else self_attn_fn
            # barrier: see models/hunyuan.py::run_blocks
            x = jax.lax.optimization_barrier(
                blk(x, ctx, temb6, rope, fn, cross_attn_fn,
                    ctx_img=ctx_img))
        return x

    def head(self, x, temb, linear_to_hilbert, t, hh, ww):
        if linear_to_hilbert is not None:
            x = jnp.take(x, linear_to_hilbert, axis=1)
            if temb.ndim == 3:
                temb = jnp.take(temb, linear_to_hilbert, axis=1)
        tm = temb[:, None] if temb.ndim == 2 else temb
        m = self.scale_shift_out[:, None] + tm[:, :, None]   # [B,1|S,2,C]
        shift, scale = m[:, :, 0], m[:, :, 1]
        x = self.norm_out(x)
        x = x * (1 + scale) + shift
        return self._unpatchify(self.proj_out(x), t, hh, ww)

    def __call__(self, latents, timestep, text_emb, image_emb=None,
                 hilbert_to_linear=None, linear_to_hilbert=None,
                 self_attn_fn: Optional[AttnFn] = None,
                 cross_attn_fn: Optional[AttnFn] = None):
        if self_attn_fn is None:
            from ..attention import attention
            self_attn_fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
        if cross_attn_fn is None:
            from ..attention import attention
            cross_attn_fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
        b, ch, t, hh, ww = latents.shape
        x, ctx, ctx_img, temb, temb6, rope = self.embed(
            latents, timestep, text_emb, hilbert_to_linear, image_emb)
        x = self.run_blocks(x, ctx, ctx_img, temb6, rope, self_attn_fn,
                            cross_attn_fn)
        return self.head(x, temb, linear_to_hilbert, t, hh, ww)

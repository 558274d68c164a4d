"""Flux.1-dev DiT backbone in flax (TPU-native re-implementation).

The reference accelerates Flux.1-dev at 4096² via a ControlNet upscaler
(reference: scripts/main_upflux.py:287-328; attention:
rectified_flux_attn.py).  Architecture: 19 double (dual-stream) + 38
single blocks, dim 3072 / 24 heads, 2-D rope over (text-id, h, w) axes
with text tokens at position 0, guidance embedding.  t = 1 makes the Jenga
curve 2-D.  The sparse layer gate (sparse iff processor_id < 37 or >= 57,
rectified_flux_attn.py:493) is expressed as a per-layer attn_fn list.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .quant import QDense
from .layers import (AdaLayerNormContinuous, DualStreamBlock, MLP,
                     SingleStreamBlock, rope_axial_freqs,
                     timestep_embedding, AttnFn)


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64            # 2x2-packed 16ch latents
    out_channels: int = 64
    hidden_dim: int = 3072
    heads: int = 24
    head_dim: int = 128
    num_dual_blocks: int = 19
    num_single_blocks: int = 38
    mlp_mult: float = 4.0
    text_dim: int = 4096             # t5 hidden
    pooled_dim: int = 768            # clip pooled
    rope_axes_dim: tuple = (16, 56, 56)
    rope_theta: float = 10000.0
    guidance_embeds: bool = True

    @classmethod
    def tiny(cls):
        return cls(in_channels=8, out_channels=8, hidden_dim=64, heads=2,
                   head_dim=32, num_dual_blocks=1, num_single_blocks=1,
                   text_dim=32, pooled_dim=16, rope_axes_dim=(8, 12, 12))


class FluxDiT(nn.Module):
    """Input: packed latent tokens [B, Sv, in_channels] (the Flux pipeline
    packs 2x2 latent patches before the transformer), text [B, St, text_dim],
    pooled [B, pooled_dim]."""
    cfg: FluxConfig

    def setup(self):
        c = self.cfg
        self.x_embedder = QDense(c.hidden_dim, name="x_embedder")
        self.context_embedder = QDense(c.hidden_dim, name="context_embedder")
        self.time_in = QDense(c.hidden_dim, name="time_in")
        self.time_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                            name="time_mlp")
        self.pooled_in = QDense(c.hidden_dim, name="pooled_in")
        self.pooled_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                              name="pooled_mlp")
        if c.guidance_embeds:
            self.guide_in = QDense(c.hidden_dim, name="guide_in")
            self.guide_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                                 name="guide_mlp")
        self.dual_blocks = [
            DualStreamBlock(c.hidden_dim, c.heads, c.mlp_mult,
                            name=f"dual_{i}")
            for i in range(c.num_dual_blocks)]
        self.single_blocks = [
            SingleStreamBlock(c.hidden_dim, c.heads, c.mlp_mult,
                              name=f"single_{i}")
            for i in range(c.num_single_blocks)]
        self.norm_out = AdaLayerNormContinuous(c.hidden_dim, name="norm_out")
        self.proj_out = QDense(c.out_channels, name="proj_out")

    def _rope(self, grid_h, grid_w, perm):
        c = self.cfg
        yy, xx = jnp.meshgrid(jnp.arange(grid_h), jnp.arange(grid_w),
                              indexing="ij")
        zeros = jnp.zeros_like(yy.ravel())
        cos, sin = rope_axial_freqs(
            (1, grid_h, grid_w), c.rope_axes_dim,
            (zeros, yy.ravel(), xx.ravel()), theta=c.rope_theta)
        if perm is not None:
            cos, sin = cos[perm], sin[perm]
        return cos, sin

    def embed(self, latent_tokens, timestep, text_emb, pooled, guidance,
              grid_h, grid_w, hilbert_to_linear):
        c = self.cfg
        x = self.x_embedder(latent_tokens)
        ctx = self.context_embedder(text_emb)
        temb = self.time_mlp(self.time_in(
            timestep_embedding(timestep * 1000.0, 256)))
        temb = temb + self.pooled_mlp(self.pooled_in(pooled))
        if c.guidance_embeds and guidance is not None:
            temb = temb + self.guide_mlp(self.guide_in(
                timestep_embedding(guidance * 1000.0, 256)))
        rope = self._rope(grid_h, grid_w, hilbert_to_linear)
        if hilbert_to_linear is not None:
            x = jnp.take(x, hilbert_to_linear, axis=1)
        return x, ctx, temb, rope

    def teacache_signal(self, x, temb):
        """Block-0 norm1 modulated input (the Flux driver uses the same
        signal shape, scripts/main_upflux.py TeaCache block)."""
        return self.dual_blocks[0].norm1(x, temb)[0]

    def run_blocks(self, x, ctx, temb, rope, attn_fn: AttnFn,
                   dual_attn_fns: Optional[Sequence[AttnFn]] = None,
                   single_attn_fns: Optional[Sequence[AttnFn]] = None,
                   controlnet_dual_residuals=None,
                   controlnet_single_residuals=None):
        """ControlNet residuals are per-block lists in the RESIDENT
        (Hilbert) token order, one entry per dual/single block — the
        pipeline interval-distributes the ControlNet's samples
        (reference: scripts/main_upflux.py:163-172,186-191 applies
        samples[i // ceil(n_blocks / n_samples)])."""
        for i, blk in enumerate(self.dual_blocks):
            fn = dual_attn_fns[i] if dual_attn_fns is not None else attn_fn
            x, ctx = blk(x, ctx, temb, rope, fn)
            if controlnet_dual_residuals is not None:
                x = x + controlnet_dual_residuals[i]
            # barrier: see models/hunyuan.py::run_blocks
            x, ctx = jax.lax.optimization_barrier((x, ctx))
        for i, blk in enumerate(self.single_blocks):
            fn = single_attn_fns[i] if single_attn_fns is not None else attn_fn
            x, ctx = blk(x, ctx, temb, rope, fn)
            if controlnet_single_residuals is not None:
                x = x + controlnet_single_residuals[i]
            x, ctx = jax.lax.optimization_barrier((x, ctx))
        return x, ctx

    def head(self, x, temb, linear_to_hilbert):
        if linear_to_hilbert is not None:
            x = jnp.take(x, linear_to_hilbert, axis=1)
        return self.proj_out(self.norm_out(x, temb))

    def __call__(self, latent_tokens, timestep, text_emb, pooled,
                 guidance=None, grid_h=None, grid_w=None,
                 hilbert_to_linear=None, linear_to_hilbert=None,
                 attn_fn: Optional[AttnFn] = None):
        if attn_fn is None:
            from ..attention import attention
            attn_fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
        x, ctx, temb, rope = self.embed(latent_tokens, timestep, text_emb,
                                        pooled, guidance, grid_h, grid_w,
                                        hilbert_to_linear)
        x, ctx = self.run_blocks(x, ctx, temb, rope, attn_fn)
        return self.head(x, temb, linear_to_hilbert)


@dataclasses.dataclass(frozen=True)
class FluxControlNetConfig:
    """diffusers FluxControlNetModel shape (the jasperai
    Flux.1-dev-Controlnet-Upscaler checkpoint: a truncated Flux trunk —
    dual blocks only — with zero-initialised conditioning embedder and
    per-block output projections; reference loads it at
    scripts/main_upflux.py:300-305)."""
    in_channels: int = 64
    cond_channels: int = 64          # packed control-image latent tokens
    hidden_dim: int = 3072
    heads: int = 24
    num_dual_blocks: int = 5
    num_single_blocks: int = 0
    mlp_mult: float = 4.0
    text_dim: int = 4096
    pooled_dim: int = 768
    rope_axes_dim: tuple = (16, 56, 56)
    rope_theta: float = 10000.0
    guidance_embeds: bool = True

    @classmethod
    def tiny(cls):
        return cls(in_channels=8, cond_channels=8, hidden_dim=64, heads=2,
                   num_dual_blocks=2, num_single_blocks=0, text_dim=32,
                   pooled_dim=16, rope_axes_dim=(8, 12, 12))


class FluxControlNet(nn.Module):
    """ControlNet conditioning network for Flux: runs a short dual-stream
    trunk on [noisy tokens + embedded control tokens] and emits one
    zero-initialised residual sample per trunk block.  The main model adds
    sample[i // ceil(n_main / n_samples)] after its block i
    (reference: main_upflux.py:163-172).

    Runs directly in the Hilbert-resident token order (attention is
    permutation-equivariant once rope is permuted alongside), so its
    samples need no extra permute — the reference instead permutes the
    samples after a linear-order ControlNet pass (main_upflux.py:114-116);
    the two compose to the same function."""
    cfg: FluxControlNetConfig

    def setup(self):
        c = self.cfg
        self.x_embedder = QDense(c.hidden_dim, name="x_embedder")
        # zero-init: at init the ControlNet is a no-op, as in diffusers
        self.controlnet_x_embedder = QDense(
            c.hidden_dim, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="controlnet_x_embedder")
        self.context_embedder = QDense(c.hidden_dim,
                                         name="context_embedder")
        self.time_in = QDense(c.hidden_dim, name="time_in")
        self.time_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                            name="time_mlp")
        self.pooled_in = QDense(c.hidden_dim, name="pooled_in")
        self.pooled_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                              name="pooled_mlp")
        if c.guidance_embeds:
            self.guide_in = QDense(c.hidden_dim, name="guide_in")
            self.guide_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                                 name="guide_mlp")
        self.dual_blocks = [
            DualStreamBlock(c.hidden_dim, c.heads, c.mlp_mult,
                            name=f"dual_{i}")
            for i in range(c.num_dual_blocks)]
        self.single_blocks = [
            SingleStreamBlock(c.hidden_dim, c.heads, c.mlp_mult,
                              name=f"single_{i}")
            for i in range(c.num_single_blocks)]
        self.controlnet_blocks = [
            QDense(c.hidden_dim, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name=f"cn_proj_{i}")
            for i in range(c.num_dual_blocks)]
        self.controlnet_single_blocks = [
            QDense(c.hidden_dim, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name=f"cn_single_proj_{i}")
            for i in range(c.num_single_blocks)]

    def _rope(self, grid_h, grid_w, perm):
        c = self.cfg
        yy, xx = jnp.meshgrid(jnp.arange(grid_h), jnp.arange(grid_w),
                              indexing="ij")
        zeros = jnp.zeros_like(yy.ravel())
        cos, sin = rope_axial_freqs(
            (1, grid_h, grid_w), c.rope_axes_dim,
            (zeros, yy.ravel(), xx.ravel()), theta=c.rope_theta)
        if perm is not None:
            cos, sin = cos[perm], sin[perm]
        return cos, sin

    def __call__(self, latent_tokens, control_tokens, timestep, text_emb,
                 pooled, guidance, grid_h, grid_w, hilbert_to_linear=None,
                 conditioning_scale: float = 1.0,
                 attn_fn: Optional[AttnFn] = None):
        """latent_tokens / control_tokens: [B, Sv, C] in Hilbert order
        (pass hilbert_to_linear to permute linear-order inputs here).
        Returns (dual_samples, single_samples) lists of [B, Sv, hidden]."""
        c = self.cfg
        if attn_fn is None:
            from ..attention import attention
            attn_fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
        if hilbert_to_linear is not None:
            latent_tokens = jnp.take(latent_tokens, hilbert_to_linear,
                                     axis=1)
            control_tokens = jnp.take(control_tokens, hilbert_to_linear,
                                      axis=1)
        x = (self.x_embedder(latent_tokens)
             + self.controlnet_x_embedder(control_tokens))
        ctx = self.context_embedder(text_emb)
        temb = self.time_mlp(self.time_in(
            timestep_embedding(timestep * 1000.0, 256)))
        temb = temb + self.pooled_mlp(self.pooled_in(pooled))
        if c.guidance_embeds and guidance is not None:
            temb = temb + self.guide_mlp(self.guide_in(
                timestep_embedding(guidance * 1000.0, 256)))
        rope = self._rope(grid_h, grid_w,
                          hilbert_to_linear if hilbert_to_linear is not None
                          else None)
        dual_samples, single_samples = [], []
        for blk, proj in zip(self.dual_blocks, self.controlnet_blocks):
            x, ctx = blk(x, ctx, temb, rope, attn_fn)
            dual_samples.append(proj(x) * conditioning_scale)
        for blk, proj in zip(self.single_blocks,
                             self.controlnet_single_blocks):
            x, ctx = blk(x, ctx, temb, rope, attn_fn)
            single_samples.append(proj(x) * conditioning_scale)
        return dual_samples, single_samples


def distribute_controlnet_samples(samples, num_blocks: int):
    """Expand N ControlNet samples to one residual per main-model block:
    block i gets samples[i // ceil(num_blocks / N)]
    (reference: main_upflux.py:163-172)."""
    if not samples:
        return None
    import math as _math
    interval = _math.ceil(num_blocks / len(samples))
    return [samples[min(i // interval, len(samples) - 1)]
            for i in range(num_blocks)]




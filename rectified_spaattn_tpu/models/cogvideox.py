"""CogVideoX 1.5 DiT backbone in flax (TPU-native re-implementation).

The reference accelerates CogVideoX1.5-5B T2V/I2V
(reference: scripts/main_cogvideox.py:213-288; attention:
rectified_cogvideo_attn.py).  Joint attention with SHARED q/k/v
projections over [text ; visual]; we natively store [visual ; text]
(the processor performs exactly this reorder before the sparse kernel,
rectified_cogvideo_attn.py:433-435 — here it is the resident layout).
RoPE applies to the visual slice only (:466-469).  The step gate
``current_step >= 5`` (:478) is expressed by the pipeline's per-step
attn_fn choice.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .quant import QDense
from .layers import (MLP, apply_rope_interleaved, rope_axial_freqs,
                     timestep_embedding, AttnFn)


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_dim: int = 3072
    heads: int = 48
    head_dim: int = 64
    num_blocks: int = 42
    mlp_mult: float = 4.0
    text_dim: int = 4096
    time_embed_dim: int = 512
    patch_size: int = 2
    patch_size_t: int = 2
    rope_axes_dim: tuple = (16, 24, 24)
    rope_theta: float = 10000.0
    use_ofs_embed: bool = True      # CogVideoX 1.5 ofs embedding
                                    # (reference: main_cogvideox.py:83-87)

    @classmethod
    def tiny(cls):
        return cls(in_channels=4, out_channels=4, hidden_dim=64, heads=2,
                   head_dim=32, num_blocks=2, text_dim=32,
                   time_embed_dim=32, patch_size_t=1,
                   rope_axes_dim=(8, 12, 12))


class CogVideoXBlock(nn.Module):
    dim: int
    heads: int
    mlp_mult: float

    @nn.compact
    def __call__(self, x, ctx, temb, rope, attn_fn: AttnFn):
        b, sv, _ = x.shape
        st = ctx.shape[1]
        hd = self.dim // self.heads

        def zero_norm(name, stream_x, stream_c):
            # chunk order matches diffusers CogVideoXLayerNormZero:
            # (shift, scale, gate, enc_shift, enc_scale, enc_gate)
            g = QDense(6 * self.dim, name=f"{name}_lin")(nn.silu(temb))
            shx, sx, gx, shc, sc, gc = jnp.split(g, 6, axis=-1)
            ln = nn.LayerNorm(epsilon=1e-5, name=f"{name}_ln")
            nx = ln(stream_x) * (1 + sx[:, None]) + shx[:, None]
            nc = ln(stream_c) * (1 + sc[:, None]) + shc[:, None]
            return nx, nc, gx[:, None], gc[:, None]

        xn, cn, gx, gc = zero_norm("norm1", x, ctx)
        fused = jnp.concatenate([xn, cn], axis=1)
        q = QDense(self.dim, name="to_q")(fused)
        k = QDense(self.dim, name="to_k")(fused)
        v = QDense(self.dim, name="to_v")(fused)
        split = lambda t: t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        # CogVideoX uses per-head LayerNorm for q/k (diffusers
        # qk_norm="layer_norm"), not RMSNorm
        q = nn.LayerNorm(epsilon=1e-6, name="norm_q")(q)
        k = nn.LayerNorm(epsilon=1e-6, name="norm_k")(k)
        if rope is not None:
            # concatenate, NOT .at[].set() — XLA:CPU miscompiles the
            # dynamic-update-slice fused into the attention dot (see
            # models/layers.py SingleStreamBlock)
            cos, sin = rope
            q = jnp.concatenate(
                [apply_rope_interleaved(q[:, :, :sv], cos, sin),
                 q[:, :, sv:]], axis=2)
            k = jnp.concatenate(
                [apply_rope_interleaved(k[:, :, :sv], cos, sin),
                 k[:, :, sv:]], axis=2)
        attn = attn_fn(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, sv + st, self.dim)
        attn = QDense(self.dim, name="to_out")(attn)
        x = x + gx * attn[:, :sv]
        ctx = ctx + gc * attn[:, sv:]

        xn, cn, gx2, gc2 = zero_norm("norm2", x, ctx)
        ff = MLP(self.dim, self.mlp_mult, name="ff")
        x = x + gx2 * ff(xn)
        ctx = ctx + gc2 * ff(cn)
        return x, ctx


class CogVideoXDiT(nn.Module):
    cfg: CogVideoXConfig

    def setup(self):
        c = self.cfg
        self.patch_embed = QDense(c.hidden_dim, name="patch_embed")
        self.text_proj = QDense(c.hidden_dim, name="text_proj")
        self.time_in = QDense(c.time_embed_dim, name="time_in")
        self.time_mlp = MLP(c.time_embed_dim, 1.0, activation="silu",
                            name="time_mlp")
        if c.use_ofs_embed:
            self.ofs_in = QDense(c.time_embed_dim, name="ofs_in")
            self.ofs_mlp = MLP(c.time_embed_dim, 1.0, activation="silu",
                               name="ofs_mlp")
        self.blocks = [
            CogVideoXBlock(c.hidden_dim, c.heads, c.mlp_mult,
                           name=f"block_{i}")
            for i in range(c.num_blocks)]
        self.norm_final = nn.LayerNorm(epsilon=1e-5, name="norm_final")
        self.norm_out_lin = QDense(2 * c.hidden_dim, name="norm_out_lin")
        self.norm_out_ln = nn.LayerNorm(epsilon=1e-5, name="norm_out_ln")
        self.proj_out = QDense(
            c.patch_size_t * c.patch_size * c.patch_size * c.out_channels,
            name="proj_out")

    def _patchify(self, latents):
        c = self.cfg
        pt, p = c.patch_size_t, c.patch_size
        b, ch, t, hh, ww = latents.shape
        x = latents.reshape(b, ch, t // pt, pt, hh // p, p, ww // p, p)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
        return x.reshape(b, (t // pt) * (hh // p) * (ww // p), -1)

    def _unpatchify(self, tokens, t, hh, ww):
        c = self.cfg
        pt, p = c.patch_size_t, c.patch_size
        b = tokens.shape[0]
        x = tokens.reshape(b, t // pt, hh // p, ww // p, pt, p, p,
                           c.out_channels)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c.out_channels, t, hh, ww)

    def _rope(self, t, hh, ww, perm):
        c = self.cfg
        pt, p = c.patch_size_t, c.patch_size
        gt, gh, gw = t // pt, hh // p, ww // p
        zz, yy, xx = jnp.meshgrid(jnp.arange(gt), jnp.arange(gh),
                                  jnp.arange(gw), indexing="ij")
        cos, sin = rope_axial_freqs(
            (gt, gh, gw), c.rope_axes_dim,
            (zz.ravel(), yy.ravel(), xx.ravel()), theta=c.rope_theta)
        if perm is not None:
            cos, sin = cos[perm], sin[perm]
        return cos, sin

    def embed(self, latents, timestep, text_emb, hilbert_to_linear,
              ofs=None):
        c = self.cfg
        b, ch, t, hh, ww = latents.shape
        x = self.patch_embed(self._patchify(latents))
        ctx = self.text_proj(text_emb)
        temb = self.time_mlp(self.time_in(
            timestep_embedding(timestep, c.time_embed_dim)))
        if c.use_ofs_embed:
            o = ofs if ofs is not None else jnp.zeros((b,), x.dtype)
            temb = temb + self.ofs_mlp(self.ofs_in(
                timestep_embedding(o, c.time_embed_dim)))
        rope = self._rope(t, hh, ww, hilbert_to_linear)
        if hilbert_to_linear is not None:
            x = jnp.take(x, hilbert_to_linear, axis=1)
        return x, ctx, temb, rope

    def run_blocks(self, x, ctx, temb, rope, attn_fn: AttnFn,
                   attn_fns=None):
        for i, blk in enumerate(self.blocks):
            fn = attn_fns[i] if attn_fns is not None else attn_fn
            # barrier: pin each block's big elementwise temporaries to its
            # own lifetime (see models/hunyuan.py::run_blocks)
            x, ctx = jax.lax.optimization_barrier(
                blk(x, ctx, temb, rope, fn))
        return x, ctx

    def head(self, x, ctx, temb, linear_to_hilbert, t, hh, ww):
        if linear_to_hilbert is not None:
            x = jnp.take(x, linear_to_hilbert, axis=1)
        x = self.norm_final(jnp.concatenate([ctx, x], axis=1))[:, ctx.shape[1]:]
        g = self.norm_out_lin(nn.silu(temb))
        shift, scale = jnp.split(g, 2, axis=-1)
        x = self.norm_out_ln(x) * (1 + scale[:, None]) + shift[:, None]
        return self._unpatchify(self.proj_out(x), t, hh, ww)

    def __call__(self, latents, timestep, text_emb, ofs=None,
                 hilbert_to_linear=None, linear_to_hilbert=None,
                 attn_fn: Optional[AttnFn] = None):
        if attn_fn is None:
            from ..attention import attention
            attn_fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
        b, ch, t, hh, ww = latents.shape
        x, ctx, temb, rope = self.embed(latents, timestep, text_emb,
                                        hilbert_to_linear, ofs)
        x, ctx = self.run_blocks(x, ctx, temb, rope, attn_fn)
        return self.head(x, ctx, temb, linear_to_hilbert, t, hh, ww)

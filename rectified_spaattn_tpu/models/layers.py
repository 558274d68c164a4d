"""Shared DiT building blocks (flax.linen), used by every model family.

One configurable skeleton instead of the reference's five forked
transformer copies (SURVEY §7: "config-driven variants of ONE
implementation, not 5 forks").  All modules operate on [B, S, C] token
streams; attention functions are injected (no monkey-patching — the
reference patches diffusers processors at runtime,
scripts/main_hunyuan.py:270-278).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .quant import QDense

# An attention function: (q, k, v) [B,H,S,D] -> [B,H,S,D].
AttnFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jax.Array:
    """Sinusoidal timestep features [B(, S), dim] (diffusers convention)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift))
    args = t.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                          axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class RMSNorm(nn.Module):
    """RMS norm over the trailing dim (used for q/k norms)."""
    dim: int
    eps: float = 1e-6
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        if self.elementwise_affine:
            w = self.param("scale", nn.initializers.ones, (self.dim,))
            x = x * w
        return x.astype(dtype)


def _select_mods(mods, mods_alt, alt_mask):
    """Per-token two-way modulation select (HunyuanVideo I2V
    ``token_replace``: first-frame tokens are conditioned at t=0, the rest
    at the current step).  ``alt_mask`` [S] bool, True -> alt modulation.
    The where of two broadcasts fuses into the consumer — no [B,S,6C]
    tensor is ever materialised (the diffusers implementation slices a
    contiguous first-frame prefix; ours selects, because Jenga curve order
    scatters the first frame across the stream)."""
    if mods_alt is None:
        return mods
    m = alt_mask[None, :, None]
    return tuple(jnp.where(m, a, v) for v, a in zip(mods, mods_alt))


class AdaLayerNormZero(nn.Module):
    """LayerNorm whose scale/shift/gates come from the conditioning vector
    (the DiT adaLN-Zero pattern).  Emits (normed_x, gate_msa, shift_mlp,
    scale_mlp, gate_mlp).

    ``emb_alt``/``alt_mask``: optional second conditioning vector applied
    to the masked tokens through the SAME projection (token_replace)."""
    dim: int

    @nn.compact
    def __call__(self, x, emb, emb_alt=None, alt_mask=None):
        lin = QDense(6 * self.dim, name="linear")

        def mods_of(e):
            parts = jnp.split(lin(nn.silu(e)), 6, axis=-1)
            # emb may be [B, C] (broadcast) or [B, S, C] (per-token
            # timesteps, Wan2.2 TI2V — scripts/main_wan22ti2v.py:81-96)
            return tuple(v[:, None] if v.ndim == 2 else v for v in parts)

        mods = _select_mods(mods_of(emb),
                            mods_of(emb_alt) if emb_alt is not None else None,
                            alt_mask)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
        normed = nn.LayerNorm(use_bias=False, use_scale=False,
                              epsilon=1e-6)(x)
        x = normed * (1 + scale_msa) + shift_msa
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    """3-way (shift, scale, gate) adaLN used by single-stream blocks
    (diffusers AdaLayerNormZeroSingle)."""
    dim: int

    @nn.compact
    def __call__(self, x, emb, emb_alt=None, alt_mask=None):
        lin = QDense(3 * self.dim, name="linear")

        def mods_of(e):
            parts = jnp.split(lin(nn.silu(e)), 3, axis=-1)
            return tuple(v[:, None] if v.ndim == 2 else v for v in parts)

        shift, scale, gate = _select_mods(
            mods_of(emb),
            mods_of(emb_alt) if emb_alt is not None else None, alt_mask)
        normed = nn.LayerNorm(use_bias=False, use_scale=False,
                              epsilon=1e-6)(x)
        return normed * (1 + scale) + shift, gate


class AdaLayerNormContinuous(nn.Module):
    """Final-layer modulated norm: x * (1+scale) + shift from conditioning."""
    dim: int

    @nn.compact
    def __call__(self, x, emb, emb_alt=None, alt_mask=None):
        lin = QDense(2 * self.dim, name="linear")

        def mods_of(e):
            parts = jnp.split(lin(nn.silu(e)), 2, axis=-1)
            return tuple(v[:, None] if v.ndim == 2 else v for v in parts)

        shift, scale = _select_mods(
            mods_of(emb),
            mods_of(emb_alt) if emb_alt is not None else None, alt_mask)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        return x * (1 + scale) + shift


class MLP(nn.Module):
    """Two-layer FFN.  ``chunk > 1`` evaluates the FFN over ``chunk``
    static sequence slices, chained through optimization_barrier so only
    ONE [rows/chunk, hidden] intermediate is live at a time — a pure
    peak-HBM lever (identical math, identical params; at video scale the
    fc1 output is ~2 GB bf16 per block).  Slices stay large (10k+ rows)
    so the MXU tiling is unaffected."""
    dim: int
    mult: float = 4.0
    activation: str = "gelu_tanh"
    chunk: int = 1

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.mult)
        fc1 = QDense(hidden, name="fc1")
        fc2 = QDense(self.dim, name="fc2")
        if self.activation == "gelu_tanh":
            act = lambda h: nn.gelu(h, approximate=True)
        elif self.activation == "gelu":
            act = lambda h: nn.gelu(h, approximate=False)
        elif self.activation == "silu":
            act = nn.silu
        else:
            raise ValueError(self.activation)
        s = x.shape[-2]
        if self.chunk <= 1 or s < 2 * self.chunk:
            return fc2(act(fc1(x)))
        bounds = [s * i // self.chunk for i in range(self.chunk + 1)]
        outs, prev = [], None
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            xi = x[..., lo:hi, :]
            if prev is not None:
                # serialize chunks: without the tie XLA's scheduler
                # overlaps all fc1 prologues and the peak saving is lost
                xi, prev = jax.lax.optimization_barrier((xi, prev))
            prev = fc2(act(fc1(xi)))
            outs.append(prev)
        return jnp.concatenate(outs, axis=-2)


# ----------------------------------------------------------------- RoPE ----

def rope_axial_freqs(dims: tuple[int, ...], head_dim_split: tuple[int, ...],
                     positions: tuple[jax.Array, ...],
                     theta: float = 10000.0) -> tuple[jax.Array, jax.Array]:
    """Axial multi-dim RoPE tables (Hunyuan / Flux / CogVideoX style).

    For each axis a with ``head_dim_split[a]`` channels, frequencies are
    1/theta^(2i/d_a); returns (cos, sin) of shape [S, sum(d_a)//1] matching
    the interleaved-pairs convention (channel pairs rotated together).
    """
    del dims
    cos_parts, sin_parts = [], []
    for d_a, pos in zip(head_dim_split, positions):
        half = d_a // 2
        freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) * 2 / d_a))
        angles = pos.astype(jnp.float32)[:, None] * freqs[None, :]  # [S, half]
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return (jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1))


def apply_rope_interleaved(x: jax.Array, cos: jax.Array,
                           sin: jax.Array) -> jax.Array:
    """Rotate channel pairs (x0,x1),(x2,x3)... — diffusers
    ``apply_rotary_emb`` interleaved convention (Hunyuan/Flux/Cog).
    x: [B,H,S,D]; cos/sin: [S, D/2]."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    x0, x1 = x_pairs[..., 0], x_pairs[..., 1]
    c = cos[None, None, :, :]
    s = sin[None, None, :, :]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(xf.shape).astype(dtype)


def apply_rope_complex(x: jax.Array, cos: jax.Array,
                       sin: jax.Array) -> jax.Array:
    """Wan-style rotation: mathematically identical to interleaved pairs
    (the reference implements it with complex multiply,
    rectified_wan21_attn.py:434-441)."""
    return apply_rope_interleaved(x, cos, sin)


# --------------------------------------------------------------- blocks ----

class JointAttention(nn.Module):
    """Joint attention over [visual ; text] with per-stream qkv projections
    (MMDiT / dual-stream pattern used by Hunyuan, Flux)."""
    dim: int
    heads: int
    qk_norm: bool = True

    @nn.compact
    def __call__(self, x, ctx, rope, attn_fn: AttnFn):
        b, sv, _ = x.shape
        st = ctx.shape[1]
        hd = self.dim // self.heads

        def qkv(stream, prefix):
            q = QDense(self.dim, name=f"{prefix}to_q")(stream)
            k = QDense(self.dim, name=f"{prefix}to_k")(stream)
            v = QDense(self.dim, name=f"{prefix}to_v")(stream)
            split = lambda t: t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
            return split(q), split(k), split(v)

        q_x, k_x, v_x = qkv(x, "")
        q_c, k_c, v_c = qkv(ctx, "add_")
        if self.qk_norm:
            q_x = RMSNorm(hd, name="norm_q")(q_x)
            k_x = RMSNorm(hd, name="norm_k")(k_x)
            q_c = RMSNorm(hd, name="norm_added_q")(q_c)
            k_c = RMSNorm(hd, name="norm_added_k")(k_c)
        if rope is not None:
            cos, sin = rope
            q_x = apply_rope_interleaved(q_x, cos, sin)
            k_x = apply_rope_interleaved(k_x, cos, sin)
        q = jnp.concatenate([q_x, q_c], axis=2)
        k = jnp.concatenate([k_x, k_c], axis=2)
        v = jnp.concatenate([v_x, v_c], axis=2)

        out = attn_fn(q, k, v)                       # [B,H,Sv+St,D]
        out = out.transpose(0, 2, 1, 3).reshape(b, sv + st, self.dim)
        out_x, out_c = out[:, :sv], out[:, sv:]
        out_x = QDense(self.dim, name="to_out")(out_x)
        out_c = QDense(self.dim, name="to_add_out")(out_c)
        return out_x, out_c


class DualStreamBlock(nn.Module):
    """MMDiT block: visual and text streams with separate norms/MLPs and
    one joint attention (Hunyuan dual-stream / Flux double blocks).

    setup-style so ``norm1`` is externally addressable: block 0's norm1
    output is the TeaCache signal (reference: scripts/main_hunyuan.py:113).
    """
    dim: int
    heads: int
    mlp_mult: float = 4.0
    mlp_chunk: int = 1           # visual-stream FFN chunking (see MLP.chunk)

    def setup(self):
        self.norm1 = AdaLayerNormZero(self.dim, name="norm1")
        self.norm1_context = AdaLayerNormZero(self.dim, name="norm1_context")
        self.attn = JointAttention(self.dim, self.heads, name="attn")
        self.norm2 = nn.LayerNorm(use_bias=False, use_scale=False,
                                  epsilon=1e-6, name="norm2")
        self.norm2_context = nn.LayerNorm(use_bias=False, use_scale=False,
                                          epsilon=1e-6, name="norm2_context")
        self.ff = MLP(self.dim, self.mlp_mult, name="ff",
                      chunk=self.mlp_chunk)
        self.ff_context = MLP(self.dim, self.mlp_mult, name="ff_context")

    def __call__(self, x, ctx, temb, rope, attn_fn: AttnFn,
                 temb_alt=None, alt_mask=None):
        """``temb_alt``/``alt_mask``: HunyuanVideo I2V token_replace —
        visual tokens under the mask are modulated by ``temb_alt`` (the
        t=0 conditioning of the clean first frame); the text stream always
        uses ``temb``."""
        xn, xg_msa, x_shift, x_scale, xg_mlp = self.norm1(
            x, temb, temb_alt, alt_mask)
        cn, cg_msa, c_shift, c_scale, cg_mlp = self.norm1_context(ctx, temb)
        attn_x, attn_c = self.attn(xn, cn, rope, attn_fn)
        x = x + xg_msa * attn_x
        ctx = ctx + cg_msa * attn_c
        xm = self.norm2(x) * (1 + x_scale) + x_shift
        x = x + xg_mlp * self.ff(xm)
        cm = self.norm2_context(ctx) * (1 + c_scale) + c_shift
        ctx = ctx + cg_mlp * self.ff_context(cm)
        return x, ctx


class SingleStreamBlock(nn.Module):
    """Parallel attention+MLP over the fused [visual ; text] stream
    (Hunyuan single-stream / Flux single blocks)."""
    dim: int
    heads: int
    mlp_mult: float = 4.0
    mlp_chunk: int = 1           # fused MLP+proj_out chunking (see MLP.chunk)

    @nn.compact
    def __call__(self, x, ctx, temb, rope, attn_fn: AttnFn,
                 temb_alt=None, alt_mask=None):
        b, sv, _ = x.shape
        st = ctx.shape[1]
        hd = self.dim // self.heads
        fused = jnp.concatenate([x, ctx], axis=1)
        if alt_mask is not None and alt_mask.shape[0] == sv:
            # token_replace: text tail always uses the step conditioning
            alt_mask = jnp.pad(alt_mask, (0, st))
        normed, gate = AdaLayerNormZeroSingle(self.dim, name="norm")(
            fused, temb, temb_alt, alt_mask)

        qkv = QDense(3 * self.dim, name="to_qkv")(normed)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        q = RMSNorm(hd, name="norm_q")(q)
        k = RMSNorm(hd, name="norm_k")(k)
        if rope is not None:
            # concatenate, NOT .at[:, :, :sv].set(): XLA:CPU miscompiles the
            # dynamic-update-slice when it fuses into the attention dot
            # (jit output deviates ~10% from the fp64 oracle; eager is
            # correct — verified empirically, jax 0.8.x).  concat lowers to
            # the same copy and is safe on both backends.
            cos, sin = rope
            q = jnp.concatenate(
                [apply_rope_interleaved(q[:, :, :sv], cos, sin),
                 q[:, :, sv:]], axis=2)
            k = jnp.concatenate(
                [apply_rope_interleaved(k[:, :, :sv], cos, sin),
                 k[:, :, sv:]], axis=2)
        attn = attn_fn(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, sv + st, self.dim)

        proj_mlp = QDense(int(self.dim * self.mlp_mult), name="proj_mlp")
        proj_out = QDense(self.dim, name="proj_out")
        s = normed.shape[1]
        if self.mlp_chunk <= 1 or s < 2 * self.mlp_chunk:
            mlp_h = nn.gelu(proj_mlp(normed), approximate=True)
            out = proj_out(jnp.concatenate([attn, mlp_h], axis=-1))
        else:
            # chunk the fused MLP+output projection over the sequence so
            # only one [rows/chunk, 4*dim] gelu intermediate is live —
            # same peak-HBM lever as MLP.chunk (attn is already whole)
            bounds = [s * i // self.mlp_chunk
                      for i in range(self.mlp_chunk + 1)]
            outs, prev = [], None
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                ni, ai = normed[:, lo:hi], attn[:, lo:hi]
                if prev is not None:
                    ni, prev = jax.lax.optimization_barrier((ni, prev))
                mh = nn.gelu(proj_mlp(ni), approximate=True)
                prev = proj_out(jnp.concatenate([ai, mh], axis=-1))
                outs.append(prev)
            out = jnp.concatenate(outs, axis=1)
        fused = fused + gate * out
        return fused[:, :sv], fused[:, sv:]


class CrossAttnBlock(nn.Module):
    """Wan-style block: modulated self-attention over visual tokens, then
    un-modulated cross-attention to text, then modulated FFN
    (reference: Wan drivers keep attn1 sparse / attn2 dense-flash,
    scripts/main_wan21t2v.py:293-301)."""
    dim: int
    heads: int
    mlp_mult: float = 4.0
    image_cross: bool = False    # Wan I2V: extra image-context cross attn
    mlp_chunk: int = 1           # FFN sequence chunking (see MLP.chunk)

    @nn.compact
    def __call__(self, x, ctx, temb6, rope, self_attn_fn: AttnFn,
                 cross_attn_fn: AttnFn, ctx_img=None):
        """``temb6``: the shared 6-way time projection, [B, 6, C] or
        [B, S, 6, C] for per-token timesteps (Wan2.2 TI2V)."""
        b, sv, _ = x.shape
        hd = self.dim // self.heads
        split = lambda t: t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
        merge = lambda t: t.transpose(0, 2, 1, 3).reshape(b, -1, self.dim)

        # Wan modulation: per-block learned table + shared 6-way projection.
        mod = self.param("scale_shift_table",
                         nn.initializers.normal(0.02), (1, 6, self.dim))
        tm = temb6[:, None] if temb6.ndim == 3 else temb6   # [B,1|S,6,C]
        m = mod[:, None] + tm
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            m[:, :, i] for i in range(6))

        # Wan norms q/k over the FULL hidden dim before the head split
        # (reference applies attn.norm_q pre-unflatten,
        # rectified_wan21_attn.py:423-430) — unlike Hunyuan's per-head norm.
        xn = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                          name="norm1")(x)
        xn = xn * (1 + scale_msa) + shift_msa
        q = split(RMSNorm(self.dim, name="attn1_norm_q")(
            QDense(self.dim, name="attn1_to_q")(xn)))
        k = split(RMSNorm(self.dim, name="attn1_norm_k")(
            QDense(self.dim, name="attn1_to_k")(xn)))
        v = split(QDense(self.dim, name="attn1_to_v")(xn))
        if rope is not None:
            cos, sin = rope
            q = apply_rope_complex(q, cos, sin)
            k = apply_rope_complex(k, cos, sin)
        attn = merge(self_attn_fn(q, k, v))
        attn = QDense(self.dim, name="attn1_to_out")(attn)
        x = x + gate_msa * attn

        # Cross attention to text (always dense).
        xc = nn.LayerNorm(epsilon=1e-6, use_scale=True, use_bias=True,
                          name="norm2")(x)
        q2 = split(RMSNorm(self.dim, name="attn2_norm_q")(
            QDense(self.dim, name="attn2_to_q")(xc)))
        k2 = split(RMSNorm(self.dim, name="attn2_norm_k")(
            QDense(self.dim, name="attn2_to_k")(ctx)))
        v2 = split(QDense(self.dim, name="attn2_to_v")(ctx))
        cross = cross_attn_fn(q2, k2, v2)
        if self.image_cross and ctx_img is not None:
            k2i = split(RMSNorm(self.dim, name="attn2_norm_added_k")(
                QDense(self.dim, name="attn2_add_k_proj")(ctx_img)))
            v2i = split(QDense(self.dim, name="attn2_add_v_proj")(ctx_img))
            cross = cross + cross_attn_fn(q2, k2i, v2i)
        x = x + QDense(self.dim, name="attn2_to_out")(merge(cross))

        xm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                          name="norm3")(x)
        xm = xm * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * MLP(self.dim, self.mlp_mult, name="ffn",
                               chunk=self.mlp_chunk)(xm)
        return x

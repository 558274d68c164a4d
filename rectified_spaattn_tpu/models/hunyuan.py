"""HunyuanVideo DiT backbone in flax (TPU-native re-implementation).

Mirrors the architecture the reference accelerates through diffusers'
``HunyuanVideoTransformer3DModel`` (reference driver:
scripts/main_hunyuan.py:232-238; patched forward :45-210): 3-D patchify,
token-refined text conditioning, 20 dual-stream + 40 single-stream blocks
with joint visual+text attention, adaLN-continuous head.

Differences from the torch stack by design:
  * the Jenga/Gilbert permutation and the sparse-attention injection are
    first-class forward arguments, not monkey-patches;
  * the forward is split into embed / blocks / head stages so the TeaCache
    step-skip (cache/teacache.py) can branch in the host sampler loop
    without retracing (SURVEY §7 "TeaCache's data-dependent step skip").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .quant import QDense
from .layers import (
    AdaLayerNormContinuous, DualStreamBlock, MLP, RMSNorm, SingleStreamBlock,
    rope_axial_freqs, timestep_embedding, AttnFn)


@dataclasses.dataclass(frozen=True)
class HunyuanVideoConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_dim: int = 3072
    heads: int = 24
    head_dim: int = 128
    num_dual_blocks: int = 20
    num_single_blocks: int = 40
    mlp_mult: float = 4.0
    patch_size: int = 2          # spatial
    patch_size_t: int = 1        # temporal
    text_dim: int = 4096         # llama hidden
    pooled_dim: int = 768        # CLIP pooled projection
    rope_axes_dim: tuple = (16, 56, 56)   # (t, h, w) channels of head_dim
    rope_theta: float = 256.0
    num_refiner_blocks: int = 2
    guidance_embeds: bool = True
    # "token_replace": HunyuanVideo-I2V (720p v2) — the clean first latent
    # frame is held in the stream and its tokens are modulated at t=0;
    # "latent_concat": I2V v1 (544p) — [noise 16 | image latents 16 |
    # mask 1] channel concat, handled at the pipeline seam
    # (diffusers HunyuanVideoTransformer3DModel image_condition_type);
    # None = T2V.  The reference has no Hunyuan-I2V driver — this mirrors
    # the diffusers model the reference's processors would patch.
    image_condition_type: Optional[str] = None
    mlp_chunk: int = 1           # FFN sequence chunking (peak-HBM lever;
                                 # see layers.MLP.chunk)

    @classmethod
    def tiny(cls):
        """Small config for CPU tests."""
        return cls(in_channels=4, out_channels=4, hidden_dim=64, heads=2,
                   head_dim=32, num_dual_blocks=1, num_single_blocks=1,
                   text_dim=32, pooled_dim=16, rope_axes_dim=(8, 12, 12),
                   num_refiner_blocks=1)


class TokenRefiner(nn.Module):
    """Text token refiner (diffusers HunyuanVideoTokenRefiner): projects
    llama hidden states and refines them with a small timestep-conditioned
    transformer.  Kept dense — the reference leaves these attention layers
    untouched (scripts/main_hunyuan.py:272-274)."""
    cfg: HunyuanVideoConfig

    @nn.compact
    def __call__(self, text_emb, timestep, text_mask):
        c = self.cfg
        t_emb = timestep_embedding(timestep, 256)
        t_emb = MLP(c.hidden_dim, 1.0, activation="silu", name="time_mlp")(
            QDense(c.hidden_dim, name="time_in")(t_emb))
        if text_mask is None:
            pooled = jnp.mean(text_emb, axis=1)
        else:
            w = text_mask.astype(text_emb.dtype)[..., None]
            pooled = jnp.sum(text_emb * w, axis=1) / jnp.clip(
                jnp.sum(w, axis=1), 1e-3)
        p_emb = MLP(c.hidden_dim, 1.0, activation="silu", name="pool_mlp")(
            QDense(c.hidden_dim, name="pool_in")(pooled))
        cond = t_emb + p_emb

        x = QDense(c.hidden_dim, name="proj_in")(text_emb)
        hd = c.hidden_dim // c.heads
        for i in range(c.num_refiner_blocks):
            gate = QDense(2 * c.hidden_dim, name=f"blk{i}_ada")(nn.silu(cond))
            g_attn, g_mlp = jnp.split(gate, 2, axis=-1)
            xn = nn.LayerNorm(epsilon=1e-6, name=f"blk{i}_norm1")(x)
            qkv = QDense(3 * c.hidden_dim, name=f"blk{i}_qkv")(xn)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda t: t.reshape(t.shape[0], -1, c.heads, hd).transpose(0, 2, 1, 3)
            q, k, v = split(q), split(k), split(v)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
            if text_mask is not None:
                scores = jnp.where(text_mask[:, None, None, :], scores, -1e9)
            attn = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
            attn = attn.transpose(0, 2, 1, 3).reshape(x.shape)
            x = x + g_attn[:, None] * QDense(c.hidden_dim,
                                               name=f"blk{i}_proj")(attn)
            xm = nn.LayerNorm(epsilon=1e-6, name=f"blk{i}_norm2")(x)
            x = x + g_mlp[:, None] * MLP(c.hidden_dim, c.mlp_mult,
                                         name=f"blk{i}_mlp")(xm)
        return x


class HunyuanVideoDiT(nn.Module):
    """The transformer.  Latent input [B, C, T, H, W]; text [B, St, text_dim]."""
    cfg: HunyuanVideoConfig

    def setup(self):
        c = self.cfg
        self.x_embedder = QDense(c.hidden_dim, name="x_embedder")
        self.refiner = TokenRefiner(c, name="context_embedder")
        self.time_in = QDense(c.hidden_dim, name="time_in")
        self.time_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                            name="time_mlp")
        self.pooled_in = QDense(c.hidden_dim, name="pooled_in")
        self.pooled_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                              name="pooled_mlp")
        self.clip_pool_proj = QDense(c.pooled_dim, name="clip_pool_proj")
        if c.guidance_embeds:
            self.guide_in = QDense(c.hidden_dim, name="guide_in")
            self.guide_mlp = MLP(c.hidden_dim, 1.0, activation="silu",
                                 name="guide_mlp")
        self.dual_blocks = [
            DualStreamBlock(c.hidden_dim, c.heads, c.mlp_mult,
                            mlp_chunk=c.mlp_chunk, name=f"dual_{i}")
            for i in range(c.num_dual_blocks)]
        self.single_blocks = [
            SingleStreamBlock(c.hidden_dim, c.heads, c.mlp_mult,
                              mlp_chunk=c.mlp_chunk, name=f"single_{i}")
            for i in range(c.num_single_blocks)]
        self.norm_out = AdaLayerNormContinuous(c.hidden_dim, name="norm_out")
        self.proj_out = QDense(
            c.patch_size_t * c.patch_size * c.patch_size * c.out_channels,
            name="proj_out")

    def _patchify(self, latents):
        c = self.cfg
        b, ch, t, hh, ww = latents.shape
        pt, p = c.patch_size_t, c.patch_size
        x = latents.reshape(b, ch, t // pt, pt, hh // p, p, ww // p, p)
        # [B, T', H', W', pt, p, p, C] → tokens
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

    def embed(self, latents, timestep, text_emb, text_mask, guidance,
              hilbert_to_linear, pooled=None):
        """Stage 1: embeddings + conditioning.  Returns (hidden_states
        [B,Sv,C] in curve order, ctx [B,St,C], temb [B,C], rope).

        ``pooled`` is the CLIP pooled projection [B, pooled_dim]
        (the real checkpoints' second text input); when absent a learned
        projection of the mean llama embedding stands in."""
        c = self.cfg
        b, ch, t, hh, ww = latents.shape
        x = self.x_embedder(self._patchify(latents))
        ctx = self.refiner(text_emb, timestep, text_mask)

        if pooled is None:
            pooled = (jnp.zeros((b, c.pooled_dim), x.dtype)
                      if text_mask is None
                      else self.pooled_proj_input(text_emb, text_mask))
        temb = self._temb(timestep, pooled, guidance)

        # Jenga permutation into curve order (reference:
        # scripts/main_hunyuan.py:87-89), applied to tokens AND rope tables.
        rope = self._rope(t, hh, ww, hilbert_to_linear)
        if hilbert_to_linear is not None:
            x = jnp.take(x, hilbert_to_linear, axis=1)
        return x, ctx, temb, rope

    def _temb(self, timestep, pooled, guidance):
        c = self.cfg
        temb = self.time_mlp(self.time_in(timestep_embedding(timestep, 256)))
        temb = temb + self.pooled_mlp(self.pooled_in(pooled))
        if c.guidance_embeds and guidance is not None:
            temb = temb + self.guide_mlp(self.guide_in(
                timestep_embedding(guidance, 256)))
        return temb

    def token_replace_temb(self, text_emb, text_mask, guidance, pooled=None):
        """The t=0 conditioning vector for the held first-frame tokens
        (diffusers: token_replace_emb = time_text_embed(zeros_like(t),...));
        constant across the denoise loop."""
        b = text_emb.shape[0]
        if pooled is None:
            pooled = (jnp.zeros((b, self.cfg.pooled_dim), text_emb.dtype)
                      if text_mask is None
                      else self.pooled_proj_input(text_emb, text_mask))
        return self._temb(jnp.zeros((b,), jnp.float32), pooled, guidance)

    def pooled_proj_input(self, text_emb, text_mask):
        # pooled projection placeholder: mean over valid text tokens mapped
        # to pooled_dim (real checkpoints use CLIP pooled text — the weight
        # converter maps that projection here)
        w = text_mask.astype(text_emb.dtype)[..., None]
        pooled = jnp.sum(text_emb * w, axis=1) / jnp.clip(jnp.sum(w, axis=1),
                                                          1e-3)
        return self.clip_pool_proj(pooled)

    def teacache_signal(self, x, temb):
        """Block-0 norm1 modulated input — the TeaCache change signal
        (reference: scripts/main_hunyuan.py:113)."""
        if not self.dual_blocks:          # truncated-depth configs
            return x + temb[:, None]
        return self.dual_blocks[0].norm1(x, temb)[0]

    def run_blocks(self, x, ctx, temb, rope, attn_fn: AttnFn,
                   temb_alt=None, alt_mask=None):
        """Stage 2 (the TeaCache-skippable hot loop,
        reference: scripts/main_hunyuan.py:134-157).

        ``temb_alt``/``alt_mask`` (token_replace I2V): visual tokens under
        the CURVE-ORDER mask are modulated by the t=0 conditioning.

        The barrier between blocks pins each block's big elementwise
        temporaries (fp32 RoPE rotation at video scale is ~1.4 GB per
        projection) to that block's lifetime — without it the XLA
        scheduler overlaps block prologues and the unrolled deep model
        OOMs on temps that could never coexist in program order."""
        for blk in self.dual_blocks:
            x, ctx = jax.lax.optimization_barrier(
                blk(x, ctx, temb, rope, attn_fn, temb_alt, alt_mask))
        for blk in self.single_blocks:
            x, ctx = jax.lax.optimization_barrier(
                blk(x, ctx, temb, rope, attn_fn, temb_alt, alt_mask))
        return x, ctx

    def head(self, x, temb, linear_to_hilbert, t, hh, ww,
             temb_alt=None, alt_mask_linear=None):
        """Stage 3: inverse permutation + output projection
        (reference: scripts/main_hunyuan.py:182-193).  ``alt_mask_linear``
        is the token_replace mask in LINEAR order (x is un-permuted before
        the final norm)."""
        if linear_to_hilbert is not None:
            x = jnp.take(x, linear_to_hilbert, axis=1)
        x = self.norm_out(x, temb, temb_alt, alt_mask_linear)
        x = self.proj_out(x)
        return self._unpatchify(x, t, hh, ww)

    def __call__(self, latents, timestep, text_emb, text_mask=None,
                 guidance=None, hilbert_to_linear=None,
                 linear_to_hilbert=None, attn_fn: Optional[AttnFn] = None):
        """Full forward (single jit) — used when TeaCache is off."""
        if attn_fn is None:
            from ..attention import attention
            attn_fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
        b, ch, t, hh, ww = latents.shape
        x, ctx, temb, rope = self.embed(latents, timestep, text_emb,
                                        text_mask, guidance,
                                        hilbert_to_linear)
        x, ctx = self.run_blocks(x, ctx, temb, rope, attn_fn)
        return self.head(x, temb, linear_to_hilbert, t, hh, ww)

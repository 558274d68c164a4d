"""Flux.1-dev pipelines (reference driver: scripts/main_upflux.py).

The reference's headline Flux workload is the two-stage 4096² upscale:
base 1024² generation, then a ControlNet-conditioned high-res pass where
sparse attention pays off (65k visual + 512 text tokens).  Sparse is gated
per layer: fused-block index < 37 or >= 57 sparse, the rest dense
(rectified_flux_attn.py:493 — ids count 19 dual + 38 single blocks).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.flux import (FluxConfig, FluxDiT,
                           distribute_controlnet_samples)
from ..cache import TeaCache
from ..utils.timing import device_sync
from .base import build_site
from .schedulers import FlowMatchEulerScheduler, flux_mu_shift


def flux_unpack_latents(tokens: jax.Array, gh: int, gw: int) -> jax.Array:
    """[B, gh*gw, 4C] 2x2-packed tokens → [B, C, 2gh, 2gw] latents
    (inverse of diffusers FluxPipeline._pack_latents: feature index =
    c*4 + dy*2 + dx)."""
    b, s, f = tokens.shape
    c = f // 4
    x = tokens.reshape(b, gh, gw, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)              # [B, C, gh, 2, gw, 2]
    return x.reshape(b, c, 2 * gh, 2 * gw)


def flux_pack_latents(lat: jax.Array) -> jax.Array:
    """[B, C, H, W] latents → [B, (H/2)(W/2), 4C] packed tokens."""
    b, c, hh, ww = lat.shape
    x = lat.reshape(b, c, hh // 2, 2, ww // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)              # [B, gh, gw, C, 2, 2]
    return x.reshape(b, (hh // 2) * (ww // 2), c * 4)


@dataclasses.dataclass
class FluxPipeline:
    model: FluxDiT
    params: dict
    height: int = 1024
    width: int = 1024
    num_steps: int = 28
    sa_drop_rate: float = 0.9
    p_remain_rates: float = 0.3
    mode: str = "sparse"
    enable_teacache: bool = False
    rel_l1_thresh: float = 0.8
    text_len: int = 512
    guidance_scale: float = 3.5
    sparse_layer_gate: tuple = (37, 57)   # dense band [37, 57)
    interpret: bool = False
    vae_decode: Optional[Callable] = None
    # Multi-chip: a jax.sharding.Mesh with a "tp" axis — params are
    # tp-sharded and the sparse path runs head-parallel (shard_map); see
    # pipelines/hunyuan.py
    mesh: Optional[object] = None
    # Scan-over-blocks execution (models/scan.py): one traced block per
    # (type, attention gate) — the full-depth 12B serving mode (composes
    # with models/quant.py weight-only quantization).
    scan_blocks: bool = False
    # Row-tile the sparse-plan build (SparseConfig.plan_row_chunk):
    # memory lever for runs at the HBM ceiling.  0 = one-shot.
    plan_row_chunk: int = 0
    # Key-block-tile the plan's column stats (SparseConfig.plan_kv_tile):
    # the K/V-side companion memory lever.  0 = one-shot (default).
    plan_kv_tile: int = 0
    # Grouped-row kernel execution (SparseConfig.group_rows): G query
    # blocks per program over the union of their key sets — measured
    # faster than single-row at the Hunyuan point (RESULTS_r4.md).
    group_rows: int = 1
    # Producer-packed KV (SparseConfig.kv_pack) — peak-HBM lever.
    kv_pack: bool = False
    # Head-tiled attention execution (SparseConfig.head_chunk) — peak-HBM lever.
    head_chunk: int = 0

    def __post_init__(self):
        # latent grid: 2x2-packed 16ch latents → h/16 x w/16 tokens
        self.gh = self.height // 16
        self.gw = self.width // 16
        self.site, self.l2h, self.h2l = build_site(
            1, self.gh, self.gw, sa_drop_rate=self.sa_drop_rate,
            p_remain=self.p_remain_rates, layout="joint",
            text_len=self.text_len, plan_row_chunk=self.plan_row_chunk,
            plan_kv_tile=self.plan_kv_tile,
            group_rows=self.group_rows, kv_pack=self.kv_pack,
            head_chunk=self.head_chunk)
        m = self.model
        n_dual = m.cfg.num_dual_blocks
        from .base import param_compute_dtype
        self.compute_dtype = param_compute_dtype(self.params)
        if self.scan_blocks:
            if "scan_dual" not in self.params:   # accept pre-stacked trees
                from ..models.scan import stack_block_params
                inner = dict(self.params["params"])
                inner, dual_stack = stack_block_params(
                    inner, "dual_", m.cfg.num_dual_blocks)
                inner, single_stack = stack_block_params(
                    inner, "single_", m.cfg.num_single_blocks)
                self.params = {"params": inner, "scan_dual": dual_stack,
                               "scan_single": single_stack}
        from .base import finalize_params
        self.params = finalize_params(self.params, self.mesh)

        def embed(params, tokens, t, text, pooled, guidance):
            x, ctx, temb, rope = m.apply(
                params, tokens, t, text, pooled, guidance, self.gh,
                self.gw, self.h2l, method=FluxDiT.embed)
            if self.scan_blocks:
                # same block-0 norm1 signal from the stacked tree (Flux's
                # dual blocks share Hunyuan's DualStreamBlock)
                from ..models.scan import hunyuan_teacache_signal_scan
                sig = hunyuan_teacache_signal_scan(
                    m.cfg, params["scan_dual"], x, temb)
            else:
                sig = m.apply(params, x, temb,
                              method=FluxDiT.teacache_signal)
            cd = self.compute_dtype
            return (x.astype(cd), ctx.astype(cd), temb.astype(cd), rope,
                    sig)

        def blocks(params, x, ctx, temb, rope, tlen, sparse: bool,
                   cn_dual=None, cn_single=None,
                   want_residual: bool = False):
            dense = self.site.attn_fn(
                "vanilla" if self.interpret else "flash", text_len_rt=tlen,
                interpret=self.interpret)
            if sparse:
                sp = self.site.attn_fn("sparse", text_len_rt=tlen,
                                       interpret=self.interpret,
                                       mesh=self.mesh)
                lo, hi = self.sparse_layer_gate
                gate = lambda pid: sp if (pid < lo or pid >= hi) else dense
                dual_fns = [gate(i) for i in range(n_dual)]
                single_fns = [gate(n_dual + i)
                              for i in range(m.cfg.num_single_blocks)]
            else:
                dual_fns = [dense] * n_dual
                single_fns = [dense] * m.cfg.num_single_blocks
            if self.scan_blocks:
                from ..models.scan import flux_run_blocks_scan, gate_segments
                n_single = m.cfg.num_single_blocks
                if sparse:
                    dual_segs = gate_segments(n_dual, gate)
                    single_segs = gate_segments(
                        n_single, lambda i: gate(n_dual + i))
                else:
                    dual_segs = [(0, n_dual, dense)]
                    single_segs = [(0, n_single, dense)]
                # cn_* are the RAW sample lists here (denoise skips the
                # interval expansion in scan mode)
                x2, ctx2 = flux_run_blocks_scan(
                    m.cfg, params["scan_dual"], params["scan_single"],
                    x, ctx, temb, rope, dual_segs, single_segs,
                    cn_dual, cn_single)
            else:
                x2, ctx2 = m.apply(params, x, ctx, temb, rope, dense,
                                   dual_fns, single_fns, cn_dual, cn_single,
                                   method=FluxDiT.run_blocks)
            # residual in-jit so x can be donated (TeaCache); gated so
            # non-TeaCache runs don't pay the output buffer
            res = (x2 - x).astype(jnp.bfloat16) if want_residual else None
            return x2, ctx2, res

        def head(params, x, temb):
            return m.apply(params, x, temb, self.l2h, method=FluxDiT.head)

        self._embed = jax.jit(embed)
        self._blocks = jax.jit(
            blocks, static_argnames=("sparse", "want_residual"),
            donate_argnums=(1,))
        self._head = jax.jit(head)

    def denoise(self, tokens, text_emb, text_mask, pooled,
                controlnet_fn: Optional[Callable] = None,
                num_steps: Optional[int] = None):
        """``controlnet_fn(tokens, t) -> (dual_samples, single_samples)``
        in the RESIDENT (Hilbert) token order; the samples are interval-
        distributed over the main blocks (reference applies
        samples[i // ceil] after each block, main_upflux.py:163-172 — the
        reference permutes samples because its ControlNet runs in linear
        order, ours runs Hilbert-resident so no permute is needed)."""
        steps = num_steps or self.num_steps
        mu = flux_mu_shift(self.gh * self.gw)
        sched = FlowMatchEulerScheduler(steps, use_mu=True, mu=mu)
        tea = TeaCache(self.rel_l1_thresh if self.enable_teacache else 0.0,
                       steps, coefficients="flux-dev")
        tlen = jnp.sum(text_mask.astype(jnp.int32), axis=1)
        guidance = jnp.full((tokens.shape[0],), self.guidance_scale)
        use_sparse = self.mode == "sparse"
        m = self.model

        device_sync()
        t0 = time.perf_counter()
        for i, t in enumerate(sched.timesteps):
            ts = jnp.full((tokens.shape[0],), float(t) / 1000.0)
            x, ctx, temb, rope, sig = self._embed(
                self.params, tokens, ts, text_emb, pooled, guidance)
            cn_dual = cn_single = None
            if controlnet_fn is not None:
                dual_s, single_s = controlnet_fn(tokens, float(t))
                if self.scan_blocks:
                    # raw samples; the scan body interval-indexes them
                    cn_dual, cn_single = list(dual_s), list(single_s)
                else:
                    cn_dual = distribute_controlnet_samples(
                        dual_s, m.cfg.num_dual_blocks)
                    cn_single = distribute_controlnet_samples(
                        single_s, m.cfg.num_single_blocks)
            if tea.enabled and not tea.should_compute(sig):
                x = tea.apply_residual(x)
            else:
                x, ctx, res = self._blocks(self.params, x, ctx, temb, rope,
                                           tlen, use_sparse, cn_dual,
                                           cn_single,
                                           want_residual=tea.enabled)
                if tea.enabled:
                    tea.record_residual_value(res)
            v = self._head(self.params, x, temb)
            tokens = sched.step(v, tokens, i)
        device_sync(tokens)
        self.denoise_seconds = time.perf_counter() - t0
        self.teacache_stats = tea.stats()
        return tokens

    def __call__(self, text_emb, text_mask, pooled, seed: int = 42,
                 controlnet_fn=None, init_tokens=None,
                 num_steps: Optional[int] = None):
        cfg = self.model.cfg
        b = text_emb.shape[0]
        if init_tokens is None:
            rng = jax.random.PRNGKey(seed)
            init_tokens = jax.random.normal(
                rng, (b, self.gh * self.gw, cfg.in_channels), jnp.float32)
        tokens = self.denoise(init_tokens, text_emb, text_mask, pooled,
                              controlnet_fn, num_steps)
        if self.vae_decode is not None:
            return self.vae_decode(tokens)
        return tokens


@dataclasses.dataclass
class FluxUpscalePipeline:
    """Two-stage 4× upscale: base generation at base_res, then a high-res
    ControlNet-conditioned pass (reference: scripts/main_upflux.py:287-328
    with jasperai/Flux.1-dev-Controlnet-Upscaler).

    With a ControlNet the second stage starts from pure noise and the base
    image shapes the output through the ControlNet residuals, exactly like
    the reference's FluxControlNetPipeline.  Without one (no checkpoint),
    the fallback is conditioned img2img: the upsampled base latents seed
    the init at ``strength`` < 1 so the base image still shapes the
    output."""
    base: FluxPipeline
    up: FluxPipeline
    controlnet: Optional[object] = None   # FluxControlNet module
    controlnet_params: Optional[dict] = None
    conditioning_scale: float = 1.0
    strength: float = 0.7                 # no-ControlNet img2img fallback
    # Pixel-space control prep (the reference's path: base image → PIL
    # resize to the upscaled resolution → FluxControlNetPipeline VAE
    # re-encode, main_upflux.py:297-328).  Both operate on UNPACKED
    # latents: vae_decode [B,C,h,w] → pixels [B,3,H,W]; vae_encode the
    # inverse.  When absent, control latents come from a nearest
    # latent-space upsample instead (checkpoint-less equivalent).
    vae_decode: Optional[Callable] = None
    vae_encode: Optional[Callable] = None

    def _controlnet_fn(self, control_tokens, text_emb, pooled):
        cn, params = self.controlnet, self.controlnet_params
        up = self.up

        @jax.jit
        def run(tokens, control, ts, guidance):
            return cn.apply(params, tokens, control, ts, text_emb, pooled,
                            guidance, up.gh, up.gw, None,
                            self.conditioning_scale)

        guidance = jnp.full((control_tokens.shape[0],), up.guidance_scale)

        def fn(tokens, t):
            ts = jnp.full((tokens.shape[0],), float(t) / 1000.0)
            return run(tokens, control_tokens, ts, guidance)

        return fn

    def __call__(self, text_emb, text_mask, pooled, seed: int = 42,
                 controlnet_fn=None):
        base_tokens = self.base(text_emb, text_mask, pooled, seed=seed)
        b = base_tokens.shape[0]
        gh_b, gw_b = self.base.gh, self.base.gw
        gh_u, gw_u = self.up.gh, self.up.gw
        if self.vae_decode is not None and self.vae_encode is not None:
            # Reference control prep: decode the base image to PIXELS,
            # resize to the upscaled resolution (PIL default bicubic,
            # main_upflux.py:326-328), re-encode through the VAE, and
            # pack — the control the jasperai upscaler was trained on.
            pixels = self.vae_decode(
                flux_unpack_latents(base_tokens, gh_b, gw_b))
            ry, rx = gh_u // gh_b, gw_u // gw_b
            hi = jax.image.resize(
                pixels, (b, pixels.shape[1], pixels.shape[2] * ry,
                         pixels.shape[3] * rx), method="bicubic")
            control = flux_pack_latents(self.vae_encode(hi))
        else:
            # nearest-neighbour latent upsample 4x (2x grid in each dim
            # per stage-2 resolution config) — the checkpoint-less
            # equivalent of decode→resize→re-encode
            grid = base_tokens.reshape(b, gh_b, gw_b, -1)
            ry, rx = gh_u // gh_b, gw_u // gw_b
            grid = jnp.repeat(jnp.repeat(grid, ry, axis=1), rx, axis=2)
            control = grid.reshape(b, gh_u * gw_u, -1)
        rng = jax.random.PRNGKey(seed + 1)
        noise = jax.random.normal(rng, control.shape, control.dtype)
        if controlnet_fn is None and self.controlnet is not None:
            # control tokens enter in Hilbert order (the ControlNet runs
            # resident-order; see FluxControlNet docstring)
            control_h = jnp.take(control, self.up.h2l, axis=1)
            controlnet_fn = self._controlnet_fn(control_h, text_emb,
                                                pooled)
        if controlnet_fn is not None:
            init = noise                    # reference: pure-noise init
        else:
            init = (1 - self.strength) * control + self.strength * noise
        return self.up(text_emb, text_mask, pooled, seed=seed,
                       controlnet_fn=controlnet_fn, init_tokens=init)

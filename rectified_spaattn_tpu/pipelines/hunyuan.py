"""HunyuanVideo text-to-video pipeline (reference driver:
scripts/main_hunyuan.py).

Latent geometry (f/4, h/16, w/16); 50 flow-match Euler steps with embedded
guidance (no CFG); 256 text tokens trail the 115k visual tokens; TeaCache
over the whole block stack with the block-0 norm1 signal.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hunyuan import HunyuanVideoConfig, HunyuanVideoDiT
from ..cache import TeaCache
from ..utils.timing import StageTimer, device_sync
from .base import build_site
from .schedulers import FlowMatchEulerScheduler


def i2v_condition_concat(image, frames: int, vae_encode, lt: int):
    """HunyuanVideo-I2V v1 (544p, image_condition_type="latent_concat"):
    the image VAE-encodes as a video whose first frame is the image and
    the rest zeros; a 1-channel mask marks the first latent frame
    (diffusers HunyuanVideoImageToVideoPipeline.prepare_latents).  The
    result concatenates onto the 16 noise channels every step, feeding
    the in_channels-33 transformer.

    Returns [B, Cz + 1, lt, lh, lw]."""
    b = image.shape[0]
    video = jnp.concatenate(
        [image[:, :, None],
         jnp.zeros((b, image.shape[1], frames - 1, *image.shape[2:]),
                   image.dtype)], axis=2)
    z = vae_encode(video)
    assert z.shape[2] == lt, (z.shape, lt)
    mask = jnp.zeros((b, 1, lt, *z.shape[3:]), z.dtype).at[:, :, :1].set(1.0)
    return jnp.concatenate([z, mask], axis=1)


def i2v_first_frame(image, vae_encode):
    """HunyuanVideo-I2V (720p token_replace variant): the conditioning
    image VAE-encodes into the FIRST latent frame, which the pipeline
    holds fixed every step while its tokens are modulated at t=0
    (diffusers HunyuanVideoImageToVideoPipeline, image_condition_type
    "token_replace"; the reference ships no Hunyuan-I2V driver — this
    extends the family the way its Wan/Cog I2V drivers do).

    Returns [B, Cz, 1, lh, lw]."""
    return vae_encode(image[:, :, None])


@dataclasses.dataclass
class HunyuanVideoPipeline:
    """Args mirror the reference CLI (scripts/main_hunyuan.py:213-225)."""
    model: HunyuanVideoDiT
    params: dict
    height: int = 720
    width: int = 1280
    frames: int = 128
    num_steps: int = 50
    sa_drop_rate: float = 0.8
    p_remain_rates: float = 0.3
    mode: str = "sparse"                 # sparse | flash | vanilla
    enable_teacache: bool = False
    rel_l1_thresh: float = 0.15
    text_len: int = 256
    guidance_scale: float = 6.0
    flow_shift: float = 7.0
    interpret: bool = False
    vae_decode: Optional[Callable] = None
    # Multi-chip: a jax.sharding.Mesh with a "tp" axis (and optionally
    # "dp").  Params are tp-sharded (qkv columns / out-proj rows), the
    # sparse path runs head-parallel via shard_map, and XLA partitions
    # the rest — the reference has no multi-device execution at all.
    mesh: Optional[object] = None
    # Scan-over-blocks execution (models/scan.py): compile each block type
    # ONCE instead of unrolling 20+40 copies — the full-depth serving mode
    # (composes with quantize_params; see scripts/bench_e2e.py --full).
    scan_blocks: bool = False
    # Split each phase's scan into this many JIT dispatches per step
    # (requires scan_blocks).  For environments with a per-dispatch
    # execution watchdog — the axon tunnel kills any single dispatch past
    # ~60 s, which the full-depth dense step exceeds (~87 s).  Windows
    # use dynamic-start/static-size stack slices, so each phase compiles
    # at most two extra programs regardless of the segment count; the
    # extra dispatch overhead is ~30 ms per window.
    dispatch_segments: int = 1
    # Row-tile the sparse-plan build (SparseConfig.plan_row_chunk):
    # bounds the fp32 plan temporaries — a memory lever for runs at the
    # HBM ceiling.  0 = one-shot (default).
    plan_row_chunk: int = 0
    # Key-block-tile the plan's column stats (SparseConfig.plan_kv_tile):
    # the K/V-side companion memory lever.  0 = one-shot (default).
    plan_kv_tile: int = 0
    # Grouped-row kernel execution (SparseConfig.group_rows): G query
    # blocks per program over the union of their key sets — measured
    # faster than single-row at the Hunyuan point (RESULTS_r4.md).
    group_rows: int = 1
    # Producer-packed KV (SparseConfig.kv_pack): kills the kernel's own
    # packed [K|V] copy (~1.5 GB at the 115k video point).
    kv_pack: bool = False
    # Head-tiled attention execution (SparseConfig.head_chunk) — peak-HBM lever.
    head_chunk: int = 0
    # Keep every k-th token of the TeaCache modulated signal (the stored
    # previous_modulated at video scale is a ~0.7 GB bf16 tensor; the
    # rel-L1 is a mean over 350M elements, so a strided subsample moves
    # it O(1e-3) relative).  1 = full tensor (reference semantics).
    teacache_signal_stride: int = 1
    # TeaCache residual encode: "bf16" (reference format) or "int8"
    # (per-row absmax — halves both the persistent previous_residual and
    # the want_residual output buffer; cache/teacache.py::residual_value).
    teacache_residual: str = "bf16"
    # Keep previous_residual on the host between steps (one transfer per
    # call; frees its HBM next to the full-depth working set).
    teacache_offload: bool = False
    # Replay a recorded compute/skip schedule instead of deciding from
    # the signal (cache/teacache.py::schedule_from_trace) — the measured
    # full-depth +TeaCache tier at a published regime.
    teacache_schedule: Optional[list] = None
    # Probe the EXECUTED mask density once per denoise step (a sibling
    # jitted program: embed output -> block-0 attention inputs -> plan
    # counts; the attention kernel itself DCEs) and append the floats to
    # ``self.density_samples`` — the axon PJRT rejects host callbacks
    # inside compiled programs, so the probe is a separate dispatch (one
    # scalar readback per step, ~30 ms against a 44 s full-depth step).
    density_probe: bool = False

    def __post_init__(self):
        cfg = self.model.cfg
        self.lt = self.frames // 4
        self.lh = self.height // 16
        self.lw = self.width // 16
        self.grid = (self.lt * cfg.patch_size_t, self.lh * cfg.patch_size,
                     self.lw * cfg.patch_size)
        self.site, self.l2h, self.h2l = build_site(
            self.lt, self.lh, self.lw, sa_drop_rate=self.sa_drop_rate,
            p_remain=self.p_remain_rates, layout="joint",
            text_len=self.text_len, plan_row_chunk=self.plan_row_chunk,
            plan_kv_tile=self.plan_kv_tile,
            group_rows=self.group_rows, kv_pack=self.kv_pack,
            head_chunk=self.head_chunk)
        self.timer = StageTimer()
        m = self.model

        # token_replace I2V: the first LATENT frame's tokens (scattered by
        # the curve) are modulated at t=0 while holding the clean image
        # latent in the stream (models/hunyuan.py image_condition_type)
        self.token_replace = cfg.image_condition_type == "token_replace"
        if self.token_replace:
            ff_tokens = self.lh * self.lw        # patch_size_t == 1
            h2l_np = np.asarray(self.h2l)
            self._ff_mask_curve = jnp.asarray(h2l_np < ff_tokens)
            self._ff_mask_linear = jnp.arange(h2l_np.shape[0]) < ff_tokens

        # Activations run in the PARAM dtype (see base.param_compute_dtype);
        # RoPE tables stay fp32, the rotation upcasts locally
        # (models/layers.py::apply_rope_interleaved).
        from .base import param_compute_dtype
        self.compute_dtype = param_compute_dtype(self.params)
        if self.scan_blocks:
            if "scan_dual" not in self.params:   # accept pre-stacked trees
                from ..models.scan import stack_block_params
                inner = dict(self.params["params"])
                inner, dual_stack = stack_block_params(
                    inner, "dual_", cfg.num_dual_blocks)
                inner, single_stack = stack_block_params(
                    inner, "single_", cfg.num_single_blocks)
                # extra collections ride along unused through m.apply
                self.params = {"params": inner, "scan_dual": dual_stack,
                               "scan_single": single_stack}
        from .base import finalize_params
        self.params = finalize_params(self.params, self.mesh)

        def embed(params, latents, t, text, mask, guidance, pooled):
            x, ctx, temb, rope = m.apply(
                params, latents, t, text, mask, guidance, self.h2l,
                pooled, method=HunyuanVideoDiT.embed)
            if self.scan_blocks:
                from ..models.scan import hunyuan_teacache_signal_scan
                sig = hunyuan_teacache_signal_scan(
                    cfg, params["scan_dual"], x, temb)
            else:
                sig = m.apply(params, x, temb,
                              method=HunyuanVideoDiT.teacache_signal)
            cd = self.compute_dtype
            # sig is STORED by TeaCache as previous_modulated — keep it in
            # the model dtype like the reference (main_hunyuan.py:126 on a
            # bf16 transformer); fp32 would double the resident state.
            # An optional token stride shrinks the stored tensor for runs
            # at the HBM ceiling (rel-L1 is a mean over the tokens).
            if self.teacache_signal_stride > 1:
                sig = sig[:, ::self.teacache_signal_stride]
            return (x.astype(cd), ctx.astype(cd), temb.astype(cd), rope,
                    sig.astype(cd))

        def blocks(params, x, ctx, temb, rope, tlen, attn_mode: str,
                   temb_tr=None, want_residual: bool = False):
            fn = self.site.attn_fn(attn_mode, text_len_rt=tlen,
                                   interpret=self.interpret,
                                   mesh=self.mesh)
            mask = self._ff_mask_curve if temb_tr is not None else None
            if self.scan_blocks:
                from ..models.scan import hunyuan_run_blocks_scan
                x2, ctx2 = hunyuan_run_blocks_scan(
                    cfg, params["scan_dual"], params["scan_single"],
                    x, ctx, temb, rope, fn, temb_tr, mask)
            else:
                x2, ctx2 = m.apply(params, x, ctx, temb, rope, fn, temb_tr,
                                   mask, method=HunyuanVideoDiT.run_blocks)
            # stack residual computed in-jit (TeaCache) so x can be DONATED
            # — at video scale that input buffer is ~0.7 GB of HBM; gated
            # so non-TeaCache runs don't pay the extra output buffer
            from ..cache.teacache import residual_value
            res = (residual_value(x2, x, self.teacache_residual)
                   if want_residual else None)
            return x2, ctx2, res

        def blocks_window(params, x, ctx, temb, rope, tlen, win_start,
                          attn_mode: str, temb_tr=None, phase: str = "dual",
                          win_size: int = 0):
            assert self.scan_blocks, "dispatch windows need scan_blocks"
            fn = self.site.attn_fn(attn_mode, text_len_rt=tlen,
                                   interpret=self.interpret,
                                   mesh=self.mesh)
            mask = self._ff_mask_curve if temb_tr is not None else None
            from ..models.scan import hunyuan_run_phase_scan
            stack = params["scan_dual" if phase == "dual"
                           else "scan_single"]
            return hunyuan_run_phase_scan(cfg, stack, phase, x, ctx, temb,
                                          rope, fn, win_start, win_size,
                                          temb_tr, mask)

        def head(params, x, temb, temb_tr=None):
            t, hh, ww = self.grid
            mask = self._ff_mask_linear if temb_tr is not None else None
            return m.apply(params, x, temb, self.l2h, t, hh, ww, temb_tr,
                           mask, method=HunyuanVideoDiT.head)

        def temb_tr_fn(params, text, mask, guidance, pooled):
            return m.apply(params, text, mask, guidance, pooled,
                           method=HunyuanVideoDiT.token_replace_temb)

        self._embed = jax.jit(embed)
        self._blocks = jax.jit(
            blocks, static_argnames=("attn_mode", "want_residual"),
            donate_argnums=(1,))
        # window path: no donation (the TeaCache residual needs the
        # pre-blocks x alive across windows)
        self._blocks_window = jax.jit(
            blocks_window,
            static_argnames=("attn_mode", "phase", "win_size"))
        from ..cache.teacache import residual_value
        self._resid = jax.jit(
            lambda a, b: residual_value(a, b, self.teacache_residual))
        self._head = jax.jit(head)
        self._temb_tr = jax.jit(temb_tr_fn)

        def density(params, x, ctx, temb, rope, tlen):
            """Mean executed density of the FIRST sparse layer's plan on
            this step's real activations: apply block 0 with a probe
            attn fn that builds the exact plan (rectified_sparse_attention
            density_only) and returns zeros — everything downstream of
            the probe DCEs, so the program is embed-output -> norm/qkv ->
            plan counts."""
            from ..models.layers import DualStreamBlock, SingleStreamBlock
            from ..attention.rectified import rectified_sparse_attention
            site = self.site
            got = {}

            def attn_probe(qq, kk, vv):
                got["d"] = rectified_sparse_attention(
                    qq, kk, vv, site.cfg, site.neighbor_mask,
                    visual_len=site.visual_len, text_len_rt=tlen,
                    interpret=self.interpret, density_only=True)
                return jnp.zeros_like(qq)

            use_dual = cfg.num_dual_blocks > 0
            if self.scan_blocks:
                stack = params["scan_dual" if use_dual else "scan_single"]
                p0 = jax.tree_util.tree_map(lambda a: a[0], stack)
            else:
                p0 = params["params"][
                    "dual_0" if use_dual else "single_0"]
            blk = (DualStreamBlock if use_dual else SingleStreamBlock)(
                cfg.hidden_dim, cfg.heads, cfg.mlp_mult)
            blk.apply({"params": p0}, x, ctx, temb, rope, attn_probe)
            return got["d"]

        self._density = jax.jit(density)
        self.density_samples = []

    def denoise(self, latents, text_emb, text_mask, rng=None,
                pooled=None, num_steps: Optional[int] = None,
                first_frame=None, condition=None):
        """Run the scheduler loop; returns final latents.

        latents: [B, C, T', H', W'] initial noise in LATENT grid units.
        text_emb: [B, text_len, text_dim] (padded); text_mask: [B, text_len].
        pooled: [B, pooled_dim] CLIP pooled prompt embedding — the
        reference pipeline supplies this to the conditioning sum
        (HunyuanVideoPipeline pooled_prompt_embeds); None falls back to a
        learned mean-LLaMA projection for checkpoint-less runs.
        first_frame: [B, C, 1, H', W'] clean image latent (token_replace
        I2V): held in the stream every step, its tokens modulated at t=0.
        condition: [B, Cz + 1, T', H', W'] latent_concat I2V conditioning
        (i2v_condition_concat) channel-concatenated onto the noise every
        step; latents then carry out_channels, the model in_channels.
        """
        steps = num_steps or self.num_steps
        sched = FlowMatchEulerScheduler(steps, shift=self.flow_shift)
        self.density_samples = []
        tea = TeaCache(self.rel_l1_thresh if self.enable_teacache else 0.0,
                       steps, coefficients="hunyuan-video",
                       forced_schedule=self.teacache_schedule,
                       offload_residual=self.teacache_offload)
        tlen = jnp.sum(text_mask.astype(jnp.int32), axis=1)
        guidance = jnp.full((latents.shape[0],),
                            self.guidance_scale * 1000.0)
        attn_mode = self.mode
        tr = self.token_replace and first_frame is not None
        temb_tr = None
        if tr:
            temb_tr = self._temb_tr(self.params, text_emb, text_mask,
                                    guidance, pooled)
            temb_tr = temb_tr.astype(self.compute_dtype)

        import contextlib
        mesh_ctx = (self.mesh if self.mesh is not None
                    else contextlib.nullcontext())
        device_sync()
        t0 = time.perf_counter()
        with mesh_ctx:
            for i, t in enumerate(sched.timesteps):
                if tr:
                    latents = latents.at[:, :, :1].set(first_frame)
                ts = jnp.full((latents.shape[0],), float(t))
                model_in = (latents if condition is None else
                            jnp.concatenate(
                                [latents, condition.astype(latents.dtype)],
                                axis=1))
                x, ctx, temb, rope, sig = self._embed(
                    self.params, model_in, ts, text_emb, text_mask,
                    guidance, pooled)
                if self.density_probe:
                    self.density_samples.append(float(self._density(
                        self.params, x, ctx, temb, rope, tlen)))
                if tea.enabled and not tea.should_compute(sig):
                    x = tea.apply_residual(x)
                elif self.dispatch_segments > 1:
                    x_in = x if tea.enabled else None
                    for phase, n in (("dual", self.model.cfg.num_dual_blocks),
                                     ("single",
                                      self.model.cfg.num_single_blocks)):
                        k = min(self.dispatch_segments, n)
                        if k == 0:
                            continue
                        base, rem = divmod(n, k)
                        start = 0
                        for wi in range(k):
                            size = base + (1 if wi < rem else 0)
                            x, ctx = self._blocks_window(
                                self.params, x, ctx, temb, rope, tlen,
                                jnp.int32(start), attn_mode, temb_tr,
                                phase=phase, win_size=size)
                            start += size
                    if tea.enabled:
                        tea.record_residual_value(self._resid(x, x_in))
                else:
                    x, ctx, res = self._blocks(self.params, x, ctx, temb,
                                               rope, tlen, attn_mode,
                                               temb_tr,
                                               want_residual=tea.enabled)
                    if tea.enabled:
                        tea.record_residual_value(res)
                v_pred = self._head(self.params, x, temb, temb_tr)
                latents = sched.step(v_pred, latents, i)
            if tr:
                latents = latents.at[:, :, :1].set(first_frame)
        device_sync(latents)
        self.denoise_seconds = time.perf_counter() - t0
        self.teacache_stats = tea.stats()
        return latents

    def __call__(self, text_emb, text_mask, pooled=None, seed: int = 42,
                 num_steps: Optional[int] = None, init_latents=None,
                 first_frame=None, condition=None):
        cfg = self.model.cfg
        rng = jax.random.PRNGKey(seed)
        b = text_emb.shape[0]
        if init_latents is not None:
            latents = init_latents
        else:
            # latent_concat: the noise carries out_channels; the condition
            # fills the rest of in_channels at every model call
            noise_ch = (cfg.in_channels if condition is None
                        else cfg.in_channels - condition.shape[1])
            latents = jax.random.normal(
                rng, (b, noise_ch, self.grid[0], self.grid[1],
                      self.grid[2]), jnp.float32)
        latents = self.denoise(latents, text_emb, text_mask, pooled=pooled,
                               num_steps=num_steps, first_frame=first_frame,
                               condition=condition)
        if self.vae_decode is not None:
            return self.vae_decode(latents)
        return latents

"""Wan 2.1 / 2.2 pipelines (reference drivers: scripts/main_wan21t2v.py,
main_wan21i2v.py, main_wan22ti2v.py, main_wan22t2v.py, main_wan22i2v.py).

Wan specifics:
  * classifier-free guidance with TWO transformer calls per step and
    even/odd TeaCache state (main_wan21t2v.py:105-133);
  * visual-only sparse self-attention with first-frame block retention and
    layer/step warm-up gates (rectified_wan21_attn.py:467: layers >= 2 and
    call >= 10 sparse; I2V gates layers only, :591);
  * Wan2.2 A14B: two transformers selected by a timestep boundary
    (main_wan22t2v.py:57-61) with separate TeaCache state;
  * Wan2.2 TI2V-5B: VAE stride 32 and per-token timesteps.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan import WanConfig, WanDiT
from ..cache import TeaCache
from ..utils.timing import device_sync
from .base import build_site, classifier_free_guidance
from .schedulers import UniPCScheduler, FlowMatchEulerScheduler


def i2v_condition(image, frames: int, vae_encode, lt: int,
                  temporal_stride: int = 4):
    """Wan I2V conditioning channels (diffusers WanImageToVideoPipeline
    prepare_latents; reference driver main_wan21i2v.py:230-248 feeds the
    resulting in_channels-36 transformer).

    The conditioning image is VAE-encoded as a video whose first frame is
    the image and the rest zeros; a 4-channel mask marks the first latent
    frame.  Returns [B, 4 + Cz, lt, lh, lw] to concatenate onto the noise
    channels every denoise call.

    Args:
      image: [B, 3, H, W] pixels in [-1, 1].
      frames: pixel-frame count F (lt = (F + 3) // temporal_stride).
      vae_encode: pixels [B,3,F,H,W] -> normalised latents [B,Cz,lt,lh,lw].
    """
    b = image.shape[0]
    video = jnp.concatenate(
        [image[:, :, None],
         jnp.zeros((b, image.shape[1], frames - 1, *image.shape[2:]),
                   image.dtype)], axis=2)
    z = vae_encode(video)
    assert z.shape[2] == lt, (z.shape, lt)
    # 4-channel mask: ones on the first latent frame (temporal_stride
    # pixel-frame flags folded into channels), zeros after
    mask = jnp.zeros((b, temporal_stride, lt, *z.shape[3:]), z.dtype)
    mask = mask.at[:, :, 0].set(1.0)
    return jnp.concatenate([mask, z], axis=1)


def ti2v_first_frame(image, vae_encode):
    """Wan2.2 TI2V-5B image mode: the encoded image becomes the FIRST
    latent frame, which is held fixed during denoising while its tokens
    get per-token timestep 0 (diffusers WanImageToVideoPipeline
    expand_timesteps branch for the 5B checkpoint).

    Returns [B, Cz, 1, lh, lw]."""
    return vae_encode(image[:, :, None])


@dataclasses.dataclass
class WanPipeline:
    """Wan2.1 T2V/I2V and Wan2.2 TI2V-5B (single transformer)."""
    model: WanDiT
    params: dict
    height: int = 720
    width: int = 1280
    frames: int = 81
    num_steps: int = 50
    sa_drop_rate: float = 0.75
    p_remain_rates: float = 0.3
    mode: str = "sparse"
    enable_teacache: bool = False
    teacache_thresh: float = 0.2
    use_ret_steps: bool = False
    # None = auto-resolve the per-checkpoint polynomial the way the
    # reference drivers do (main_wan21t2v.py:273-286 picks the -ret set
    # under --use_ret_steps; main_wan21i2v.py keys on 480p/720p;
    # main_wan22ti2v.py has its own table)
    teacache_coefficients: Optional[str] = None
    # random-weight bench calibration only (cache/calibrate.py); real
    # checkpoints keep 1.0
    teacache_signal_scale: float = 1.0
    guidance_scale: float = 5.0
    flow_shift: float = 5.0
    vae_stride: tuple = (4, 16, 16)      # Wan2.2 TI2V uses (4, 32, 32)
    warm_layers: int = 2                  # leading dense warm-up layers
    warm_last_layers: int = 0             # trailing dense layers (Wan2.2
                                          # A14B keeps {0,1,40,41} dense,
                                          # rectified_wan22_attn.py:246)
    warm_calls: int = 10                  # dense warm-up calls (T2V only)
    scheduler: str = "unipc"              # unipc | euler
    is_i2v: bool = False
    interpret: bool = False
    vae_decode: Optional[Callable] = None
    # Multi-chip: a jax.sharding.Mesh with a "tp" axis — params are
    # tp-sharded and the sparse path runs head-parallel (shard_map); see
    # pipelines/hunyuan.py
    mesh: Optional[object] = None
    # Scan-over-blocks execution (models/scan.py): one traced block per
    # distinct attention gate — the full-depth 14B serving mode (composes
    # with quantize_params; see scripts/bench_e2e_wan.py).
    scan_blocks: bool = False
    # Split each gate segment's scan into this many JIT dispatches per
    # call (needs scan_blocks) — for runtimes with a per-dispatch
    # execution watchdog (the axon tunnel kills dispatches past ~60 s;
    # the full-depth 14B dense CFG call is ~62 s).  See
    # pipelines/hunyuan.py dispatch_segments.
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
    # packed [K|V] copy (~1.5 GB at Wan 75.6k tokens) — the memory lever
    # that fits the 16.4B I2V tree at full depth.
    kv_pack: bool = False
    # Head-tiled attention execution (SparseConfig.head_chunk) — the
    # second peak-HBM lever for the 16.4B I2V tree at full depth.
    head_chunk: int = 0
    # TeaCache residual encode: "bf16" (reference format) or "int8"
    # (per-row absmax — halves the residual buffers;
    # cache/teacache.py::residual_value).
    teacache_residual: str = "bf16"
    # Keep previous_residual on the host between steps.
    teacache_offload: bool = False
    # Replay a recorded compute/skip schedule instead of deciding from
    # the signal (cache/teacache.py::schedule_from_trace) — executes a
    # calibrated published-regime schedule at full depth (VERDICT r4 #1b).
    teacache_schedule: Optional[list] = None
    # Probe the EXECUTED mask density once per CFG call (a sibling jitted
    # program: first sparse block's attn1 inputs -> plan counts; the rest
    # DCEs) into ``self.density_samples`` — see pipelines/hunyuan.py.
    density_probe: bool = False
    # Keep the param tree HOST-side (numpy) at construction instead of
    # device-placing it — for pipelines whose residency a coordinator
    # manages (Wan22A14BPipeline host_swap: two 14B trees cannot
    # co-reside in 16 GB, so the low-noise tree transfers once at the
    # boundary step).  The pipeline must not be called until its params
    # are materialized.
    defer_device: bool = False

    def __post_init__(self):
        cfg = self.model.cfg
        self.lt = (self.frames + 3) // self.vae_stride[0]
        self.lh = self.height // self.vae_stride[1]
        self.lw = self.width // self.vae_stride[2]
        pt, ph, pw = cfg.patch_size
        self.grid = (self.lt * pt, self.lh * ph, self.lw * pw)
        self.site, self.l2h, self.h2l = build_site(
            self.lt, self.lh, self.lw, sa_drop_rate=self.sa_drop_rate,
            p_remain=self.p_remain_rates, layout="visual",
            first_frame_retention=True,
            plan_row_chunk=self.plan_row_chunk,
            plan_kv_tile=self.plan_kv_tile,
            group_rows=self.group_rows, kv_pack=self.kv_pack,
            head_chunk=self.head_chunk)
        m = self.model
        from .base import param_compute_dtype
        self.compute_dtype = param_compute_dtype(self.params)
        if self.scan_blocks:
            if "scan_blocks" not in self.params:  # accept pre-stacked trees
                from ..models.scan import stack_block_params
                inner = dict(self.params["params"])
                inner, stack = stack_block_params(
                    inner, "block_", cfg.num_blocks)
                self.params = {"params": inner, "scan_blocks": stack}
        if self.defer_device:
            assert self.mesh is None, \
                "defer_device does not compose with a mesh"
        else:
            from .base import finalize_params
            self.params = finalize_params(self.params, self.mesh)

        bm = self.site.cfg.block_m
        sv_true = self.site.visual_len
        pad = (-sv_true) % bm

        def embed(params, latents, t, text, image_emb):
            x, ctx, ctx_img, temb, temb6, rope = m.apply(
                params, latents, t, text, self.h2l, image_emb,
                method=WanDiT.embed)
            if pad:
                # pad the token stream ONCE so every layer's attention call
                # sees block-aligned shapes (instead of per-layer inserts)
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                cos, sin = rope
                rope = (jnp.pad(cos, ((0, pad), (0, 0))),
                        jnp.pad(sin, ((0, pad), (0, 0))))
                if temb.ndim == 3:
                    temb = jnp.pad(temb, ((0, 0), (0, pad), (0, 0)))
                if temb6.ndim == 4:
                    temb6 = jnp.pad(temb6,
                                    ((0, 0), (0, pad), (0, 0), (0, 0)))
            cd = self.compute_dtype
            ctx_img = ctx_img.astype(cd) if ctx_img is not None else None
            return (x.astype(cd), ctx.astype(cd), ctx_img,
                    temb.astype(cd), temb6.astype(cd), rope)

        def blocks(params, x, ctx, ctx_img, temb6, rope, sparse: bool,
                   want_residual: bool = False):
            dense = self.site.attn_fn(
                "vanilla" if self.interpret else "flash",
                interpret=self.interpret)
            cross = lambda q, k, v: _cross_attention(q, k, v, self.interpret)
            n = m.cfg.num_blocks
            if sparse:
                sp = self.site.attn_fn("sparse", interpret=self.interpret,
                                       mesh=self.mesh)
                fns = [dense if (i < self.warm_layers
                                 or i >= n - self.warm_last_layers) else sp
                       for i in range(n)]
            else:
                fns = [dense] * n
            if self.scan_blocks:
                from ..models.scan import wan_run_blocks_scan
                if sparse:
                    segments = [(0, self.warm_layers, dense),
                                (self.warm_layers,
                                 n - self.warm_last_layers, sp),
                                (n - self.warm_last_layers, n, dense)]
                else:
                    segments = [(0, n, dense)]
                x2 = wan_run_blocks_scan(m.cfg, params["scan_blocks"], x,
                                         ctx, ctx_img, temb6, rope,
                                         segments, cross)
            else:
                x2 = m.apply(params, x, ctx, ctx_img, temb6, rope, dense,
                             cross, fns, method=WanDiT.run_blocks)
            # residual in-jit so x can be donated (TeaCache); gated so
            # non-TeaCache runs don't pay the output buffer
            from ..cache.teacache import residual_value
            res = (residual_value(x2, x, self.teacache_residual)
                   if want_residual else None)
            return x2, res

        def head(params, x, temb):
            t, hh, ww = self.grid
            if pad:
                x = x[:, :sv_true]
                if temb.ndim == 3:
                    temb = temb[:, :sv_true]
            return m.apply(params, x, temb, self.l2h, t, hh, ww,
                           method=WanDiT.head)

        def blocks_window(params, x, ctx, ctx_img, temb6, rope, win_start,
                          kind: str = "dense", win_size: int = 0):
            assert self.scan_blocks, "dispatch windows need scan_blocks"
            dense = self.site.attn_fn(
                "vanilla" if self.interpret else "flash",
                interpret=self.interpret)
            fn = (self.site.attn_fn("sparse", interpret=self.interpret,
                                    mesh=self.mesh)
                  if kind == "sparse" else dense)
            cross = lambda q, k, v: _cross_attention(q, k, v,
                                                     self.interpret)
            from ..models.scan import wan_run_window_scan
            return wan_run_window_scan(m.cfg, params["scan_blocks"], x,
                                       ctx, ctx_img, temb6, rope, fn,
                                       cross, win_start, win_size)

        self._embed = jax.jit(embed)
        self._blocks = jax.jit(
            blocks, static_argnames=("sparse", "want_residual"),
            donate_argnums=(1,))
        # window path: no donation (the TeaCache residual needs the
        # pre-blocks x alive across windows)
        self._blocks_window = jax.jit(
            blocks_window, static_argnames=("kind", "win_size"))
        from ..cache.teacache import residual_value as _rv
        self._resid = jax.jit(
            lambda a, b: _rv(a, b, self.teacache_residual))
        self._head = jax.jit(head)

        def density(params, x, ctx, ctx_img, temb6, rope):
            """Mean executed density of the first sparse layer's plan on
            this call's real activations (see pipelines/hunyuan.py)."""
            from ..models.layers import CrossAttnBlock
            from ..attention.rectified import rectified_sparse_attention
            site = self.site
            got = {}

            def attn_probe(qq, kk, vv):
                got["d"] = rectified_sparse_attention(
                    qq, kk, vv, site.cfg, site.neighbor_mask,
                    visual_len=site.visual_len,
                    interpret=self.interpret, density_only=True)
                return jnp.zeros_like(qq)

            wl = self.warm_layers      # first sparse layer index
            if self.scan_blocks:
                p0 = jax.tree_util.tree_map(
                    lambda a: a[wl], params["scan_blocks"])
            else:
                p0 = params["params"][f"block_{wl}"]
            blk = CrossAttnBlock(cfg.hidden_dim, cfg.heads,
                                 cfg.ffn_dim / cfg.hidden_dim,
                                 image_cross=cfg.image_cross)
            cross = lambda q, k, v: _cross_attention(q, k, v,
                                                     self.interpret)
            blk.apply({"params": p0}, x, ctx, temb6, rope, attn_probe,
                      cross, ctx_img=ctx_img)
            return got["d"]

        self._density = jax.jit(density)
        self.density_samples = []

    def _exec_blocks(self, x, ctx, ctx_img, temb6, rope, sparse_now: bool,
                     want_residual: bool):
        """One transformer-stack pass: single dispatch, or
        dispatch-windowed (dispatch_segments > 1).  Returns (x, res)."""
        if self.dispatch_segments > 1 and not self.scan_blocks:
            # match the Hunyuan pipeline's blocks_window assert: a user
            # splitting dispatches to dodge the ~60 s watchdog must get a
            # diagnostic, not a silent single dispatch
            raise ValueError("dispatch_segments > 1 requires scan_blocks")
        if self.dispatch_segments <= 1:
            return self._blocks(self.params, x, ctx, ctx_img, temb6, rope,
                                sparse_now, want_residual=want_residual)
        n = self.model.cfg.num_blocks
        x_in = x if want_residual else None
        if sparse_now:
            segs = [(0, self.warm_layers, "dense"),
                    (self.warm_layers, n - self.warm_last_layers,
                     "sparse"),
                    (n - self.warm_last_layers, n, "dense")]
        else:
            segs = [(0, n, "dense")]
        for a, b, kind in segs:
            span = b - a
            if span <= 0:
                continue
            k = min(self.dispatch_segments, span)
            base, rem = divmod(span, k)
            start = a
            for wi in range(k):
                size = base + (1 if wi < rem else 0)
                x = self._blocks_window(self.params, x, ctx, ctx_img,
                                        temb6, rope, jnp.int32(start),
                                        kind=kind, win_size=size)
                start += size
        res = self._resid(x, x_in) if want_residual else None
        return x, res

    def _scheduler(self, steps):
        if self.scheduler == "unipc":
            return UniPCScheduler(steps, shift=self.flow_shift)
        return FlowMatchEulerScheduler(steps, shift=self.flow_shift)

    def tea_coefficients(self) -> str:
        """Per-checkpoint rescale polynomial, resolved the way the
        reference drivers hard-code it: -ret sets under --use_ret_steps
        (main_wan21t2v.py:273-286), 480p/720p split for I2V
        (main_wan21i2v.py), the TI2V-5B table for Wan2.2-TI2V
        (main_wan22ti2v.py).  Explicit ``teacache_coefficients`` wins."""
        if self.teacache_coefficients is not None:
            return self.teacache_coefficients
        if self.model.cfg.per_token_timesteps or self.vae_stride[1] == 32:
            return "wan2.2-ti2v-5b"
        if self.is_i2v:
            base = ("wan2.1-i2v-480p" if self.height <= 480
                    else "wan2.1-i2v-720p")
        else:
            base = "wan2.1-t2v-14b"
        return base + ("-ret" if self.use_ret_steps else "")

    def denoise(self, latents, text_cond, text_uncond, image_emb=None,
                condition=None, first_frame=None,
                num_steps: Optional[int] = None):
        """CFG loop: cond (even) and uncond (odd) calls per step with
        dual-stream TeaCache, matching the reference call pattern.

        ``condition``: I2V channels from :func:`i2v_condition`, concatenated
        onto the noise channels every call (in_channels-36 models).
        ``first_frame``: TI2V image mode — the first latent frame is held
        at this value and its tokens denoise at timestep 0 (requires
        ``cfg.per_token_timesteps``)."""
        steps = num_steps or self.num_steps
        sched = self._scheduler(steps)
        use_sparse = self.mode == "sparse"
        self.density_samples = []
        tea = TeaCache(
            self.teacache_thresh if self.enable_teacache else 0.0,
            steps * 2, coefficients=self.tea_coefficients(),
            ret_steps=(5 * 2 if self.use_ret_steps else 1 * 2),
            cutoff_steps=(steps * 2 if self.use_ret_steps
                          else steps * 2 - 2),
            cfg_streams=2, signal_scale=self.teacache_signal_scale,
            forced_schedule=self.teacache_schedule,
            offload_residual=self.teacache_offload)

        b = latents.shape[0]
        ff_tokens = 0
        if first_frame is not None:
            assert self.model.cfg.per_token_timesteps, \
                "TI2V image mode needs per_token_timesteps"
            latents = latents.at[:, :, :1].set(first_frame)
            # linear token order: latent frame 0 occupies the first
            # lh*lw // (ph*pw) tokens (patch_size[0] == 1 for Wan)
            ph, pw = self.model.cfg.patch_size[1:]
            ff_tokens = (self.grid[1] // ph) * (self.grid[2] // pw)
            n_tok = ff_tokens * self.lt

        device_sync()
        t0 = time.perf_counter()
        call = 0
        for i, t in enumerate(sched.timesteps):
            if first_frame is not None:
                ts = jnp.full((b, n_tok), float(t))
                ts = ts.at[:, :ff_tokens].set(0.0)
            else:
                ts = jnp.full((b,), float(t))
            model_in = (latents if condition is None
                        else jnp.concatenate([latents, condition], axis=1))
            outs = []
            for text in (text_cond, text_uncond):
                x, ctx, ctx_img, temb, temb6, rope = self._embed(
                    self.params, model_in, ts, text, image_emb)
                if self.density_probe:
                    self.density_samples.append(float(self._density(
                        self.params, x, ctx, ctx_img, temb6, rope)))
                # reference: timestep_proj if use_ret_steps else temb
                # (main_wan21t2v.py:103)
                sig = temb6 if self.use_ret_steps else temb
                if tea.enabled and not tea.should_compute(sig):
                    x = tea.apply_residual(x)
                else:
                    sparse_now = use_sparse and (
                        self.is_i2v or call >= self.warm_calls)
                    x, res = self._exec_blocks(x, ctx, ctx_img, temb6,
                                               rope, sparse_now,
                                               tea.enabled)
                    if tea.enabled:
                        tea.record_residual_value(res)
                outs.append(self._head(self.params, x, temb))
                call += 1
            v = classifier_free_guidance(outs[0], outs[1],
                                         self.guidance_scale)
            latents = sched.step(v, latents, i)
            if first_frame is not None:
                latents = latents.at[:, :, :1].set(first_frame)
        device_sync(latents)
        self.denoise_seconds = time.perf_counter() - t0
        self.teacache_stats = tea.stats()
        return latents

    def __call__(self, text_cond, text_uncond, image_emb=None,
                 condition=None, first_frame=None,
                 seed: int = 42, num_steps: Optional[int] = None):
        cfg = self.model.cfg
        rng = jax.random.PRNGKey(seed)
        b = text_cond.shape[0]
        noise_ch = cfg.in_channels - (
            condition.shape[1] if condition is not None else 0)
        latents = jax.random.normal(
            rng, (b, noise_ch, *self.grid), jnp.float32)
        latents = self.denoise(latents, text_cond, text_uncond, image_emb,
                               condition, first_frame, num_steps)
        if self.vae_decode is not None:
            return self.vae_decode(latents)
        return latents


def _cross_attention(q, k, v, interpret):
    from ..attention import attention
    return attention(q, k, v, mode="vanilla" if interpret else "flash")


@dataclasses.dataclass
class Wan22A14BPipeline:
    """Wan2.2 A14B dual-transformer pipeline: high-noise steps run
    ``transformer``, low-noise steps run ``transformer_2``, split by
    boundary_ratio over train timesteps (reference:
    scripts/main_wan22t2v.py:57-61); each transformer keeps its own
    TeaCache stream offset (:83-127)."""
    high: WanPipeline      # transformer (high noise)
    low: WanPipeline       # transformer_2 (low noise)
    boundary_ratio: float = 0.875
    num_train_timesteps: int = 1000
    # Two 14B trees cannot co-reside in 16 GB, but the routing is
    # SEQUENTIAL (all high-noise steps, then all low-noise): host_swap
    # keeps both trees in host RAM (construct both pipelines with
    # defer_device=True), loads the high tree at denoise start and swaps
    # the low tree in ONCE at the boundary step — a real two-tree serving
    # configuration instead of the timing-only --share_tree aliasing
    # (VERDICT r4 #4).  The swap cost is measured (swap_seconds) and
    # amortizes over the low-noise steps.
    host_swap: bool = False
    _high_host: Optional[dict] = None
    _low_host: Optional[dict] = None

    def _swap_in(self, pipe_in: WanPipeline, host_tree,
                 pipe_out: WanPipeline):
        """Free pipe_out's device tree, then device-place host_tree for
        pipe_in; returns the transfer seconds (sync-bounded)."""
        import time as _t
        import jax as _jax
        import jax.numpy as _jnp
        pipe_out.params = None                 # refcount → 0 frees HBM
        t0 = _t.perf_counter()
        pipe_in.params = _jax.tree_util.tree_map(_jnp.asarray, host_tree)
        _jax.block_until_ready(pipe_in.params)
        return _t.perf_counter() - t0

    def denoise(self, latents, text_cond, text_uncond, condition=None,
                num_steps: Optional[int] = None):
        """``condition``: I2V-A14B conditioning channels (i2v_condition) —
        the A14B I2V transformer is in_channels-36 with NO CLIP image
        branch (reference: scripts/main_wan22i2v.py uses
        WanImageToVideoPipeline on Wan2.2-I2V-A14B)."""
        steps = num_steps or self.high.num_steps
        sched = self.high._scheduler(steps)
        boundary = self.boundary_ratio * self.num_train_timesteps
        use_sparse_h = self.high.mode == "sparse"
        use_sparse_l = self.low.mode == "sparse"
        high_steps = int(np.sum(sched.timesteps >= boundary))

        tea_h = TeaCache(
            self.high.teacache_thresh if self.high.enable_teacache else 0.0,
            high_steps * 2,
            coefficients=self.high.teacache_coefficients or "wan2.2-a14b",
            ret_steps=3 * 2, cfg_streams=2,
            signal_scale=self.high.teacache_signal_scale,
            forced_schedule=self.high.teacache_schedule,
            offload_residual=self.high.teacache_offload)
        tea_l = TeaCache(
            self.low.teacache_thresh if self.low.enable_teacache else 0.0,
            (steps - high_steps) * 2,
            coefficients=self.low.teacache_coefficients or "wan2.2-a14b",
            ret_steps=2, cfg_streams=2,
            signal_scale=self.low.teacache_signal_scale,
            forced_schedule=self.low.teacache_schedule,
            offload_residual=self.low.teacache_offload)

        self.swap_seconds = 0.0
        swapped = not self.host_swap
        if self.host_swap:
            import numpy as _np
            if self._high_host is None:
                for x in jax.tree_util.tree_leaves(self.high.params):
                    assert isinstance(x, _np.ndarray), (
                        "host_swap: construct both pipelines with "
                        "defer_device=True (host numpy trees)")
                self._high_host = self.high.params
                self._low_host = self.low.params
            self.load_seconds = self._swap_in(self.high, self._high_host,
                                              self.low)

        device_sync()
        t0 = time.perf_counter()
        for i, t in enumerate(sched.timesteps):
            is_high = t >= boundary
            if not is_high and not swapped:
                # one-time boundary swap: high tree out, low tree in
                device_sync(latents)
                self.swap_seconds = self._swap_in(
                    self.low, self._low_host, self.high)
                swapped = True
            pipe = self.high if is_high else self.low
            tea = tea_h if is_high else tea_l
            use_sparse = use_sparse_h if is_high else use_sparse_l
            ts = jnp.full((latents.shape[0],), float(t))
            model_in = (latents if condition is None
                        else jnp.concatenate([latents, condition], axis=1))
            outs = []
            for text in (text_cond, text_uncond):
                x, ctx, ctx_img, temb, temb6, rope = pipe._embed(
                    pipe.params, model_in, ts, text, None)
                if tea.enabled and not tea.should_compute(temb):
                    x = tea.apply_residual(x)
                else:
                    x, res = pipe._exec_blocks(x, ctx, ctx_img, temb6,
                                               rope, use_sparse,
                                               tea.enabled)
                    if tea.enabled:
                        tea.record_residual_value(res)
                outs.append(pipe._head(pipe.params, x, temb))
            v = classifier_free_guidance(outs[0], outs[1],
                                         pipe.guidance_scale)
            latents = sched.step(v, latents, i)
        device_sync(latents)
        self.denoise_seconds = time.perf_counter() - t0
        if tea_h.enabled or tea_l.enabled:
            self.teacache_stats = {
                "high": tea_h.stats(), "low": tea_l.stats()}
        return latents

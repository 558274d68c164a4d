"""CogVideoX1.5-5B T2V/I2V pipeline (reference driver:
scripts/main_cogvideox.py).

DDIM with dynamic CFG (use_dynamic_cfg, guidance 6.0,
main_cogvideox.py:274-288); TeaCache keyed on the time embedding
(:106-118); sparse attention step-gated at call >= 5
(rectified_cogvideo_attn.py:478).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.cogvideox import CogVideoXConfig, CogVideoXDiT
from ..cache import TeaCache
from ..utils.timing import device_sync
from .base import build_site, classifier_free_guidance
from .schedulers import CogVideoXDDIMScheduler, dynamic_cfg_scale


def cog_i2v_condition(image, vae_encode, grid):
    """CogVideoX I2V conditioning channels (diffusers
    CogVideoXImageToVideoPipeline: image latents concatenated along the
    CHANNEL dim every call → in_channels 32; reference driver:
    main_cogvideox.py:213-222,274-288).

    The conditioning image is VAE-encoded into the first latent frame;
    the remaining frames are zeros.  Returns [B, Cz, *grid]."""
    z0 = vae_encode(image[:, :, None])          # [B, Cz, 1, h, w]
    b, cz = z0.shape[:2]
    rest = jnp.zeros((b, cz, grid[0] - 1, *grid[1:]), z0.dtype)
    return jnp.concatenate([z0[:, :, :1], rest], axis=2)


@dataclasses.dataclass
class CogVideoXPipeline:
    model: CogVideoXDiT
    params: dict
    height: int = 768
    width: int = 1360
    frames: int = 81
    num_steps: int = 50
    sa_drop_rate: float = 0.85
    p_remain_rates: float = 0.3
    mode: str = "sparse"
    enable_teacache: bool = False
    teacache_thresh: float = 0.2
    # random-weight bench calibration only (cache/calibrate.py); real
    # checkpoints keep 1.0
    teacache_signal_scale: float = 1.0
    text_len: int = 256                 # padded t5 tokens (226 used)
    guidance_scale: float = 6.0
    use_dynamic_cfg: bool = True
    sparse_warm_calls: int = 5
    is_i2v: bool = False
    interpret: bool = False
    vae_decode: Optional[Callable] = None
    # Multi-chip: a jax.sharding.Mesh with a "tp" axis — params are
    # tp-sharded and the sparse path runs head-parallel (shard_map); see
    # pipelines/hunyuan.py
    mesh: Optional[object] = None
    # Scan-over-blocks execution (models/scan.py): one traced block —
    # composes with models/quant.py weight-only quantization.
    scan_blocks: bool = False
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
    # Producer-packed KV (SparseConfig.kv_pack) — peak-HBM lever.
    kv_pack: bool = False
    # Head-tiled attention execution (SparseConfig.head_chunk) — peak-HBM lever.
    head_chunk: int = 0

    def __post_init__(self):
        cfg = self.model.cfg
        self.lt = (self.frames - 1) // 8 + 1
        self.lh = self.height // 16
        self.lw = self.width // 16
        pt, p = cfg.patch_size_t, cfg.patch_size
        self.grid = ((self.lt + pt - 1) // pt * pt, self.lh * p, self.lw * p)
        gt = self.grid[0] // pt
        self.site, self.l2h, self.h2l = build_site(
            gt, self.lh, self.lw, sa_drop_rate=self.sa_drop_rate,
            p_remain=self.p_remain_rates, layout="joint",
            text_len=self.text_len, plan_row_chunk=self.plan_row_chunk,
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
        from .base import finalize_params
        self.params = finalize_params(self.params, self.mesh)

        def embed(params, latents, t, text, ofs):
            x, ctx, temb, rope = m.apply(params, latents, t, text, self.h2l,
                                         ofs, method=CogVideoXDiT.embed)
            cd = self.compute_dtype
            return x.astype(cd), ctx.astype(cd), temb.astype(cd), rope

        def blocks(params, x, ctx, temb, rope, tlen, sparse: bool,
                   want_residual: bool = False):
            dense = self.site.attn_fn(
                "vanilla" if self.interpret else "flash", text_len_rt=tlen,
                interpret=self.interpret)
            fn = (self.site.attn_fn("sparse", text_len_rt=tlen,
                                    interpret=self.interpret,
                                    mesh=self.mesh)
                  if sparse else dense)
            if self.scan_blocks:
                from ..models.scan import cog_run_blocks_scan
                x2, ctx2 = cog_run_blocks_scan(
                    m.cfg, params["scan_blocks"], x, ctx, temb, rope, fn)
            else:
                x2, ctx2 = m.apply(params, x, ctx, temb, rope, fn,
                                   method=CogVideoXDiT.run_blocks)
            # residuals in-jit so x/ctx can be donated (TeaCache needs the
            # encoder residual too — reference main_cogvideox.py:129-143);
            # gated so non-TeaCache runs don't pay the output buffers
            if not want_residual:
                return x2, ctx2, None, None
            return (x2, ctx2, (x2 - x).astype(jnp.bfloat16),
                    (ctx2 - ctx).astype(jnp.bfloat16))

        def head(params, x, ctx, temb):
            t, hh, ww = self.grid
            return m.apply(params, x, ctx, temb, self.l2h, t, hh, ww,
                           method=CogVideoXDiT.head)

        self._embed = jax.jit(embed)
        self._blocks = jax.jit(
            blocks, static_argnames=("sparse", "want_residual"),
            donate_argnums=(1, 2))
        self._head = jax.jit(head)

    def denoise(self, latents, text_cond, text_uncond, condition=None,
                num_steps: Optional[int] = None):
        """``condition``: I2V image-latent channels (cog_i2v_condition),
        concatenated along channels every call; I2V also sets the ofs
        embedding input to 2.0 (diffusers: ofs_emb fill_value=2.0)."""
        steps = num_steps or self.num_steps
        sched = CogVideoXDDIMScheduler(steps)
        tea = TeaCache(
            self.teacache_thresh if self.enable_teacache else 0.0,
            steps * 2, coefficients="cogvideox1.5-5b", cfg_streams=2,
            signal_scale=self.teacache_signal_scale)
        use_sparse = self.mode == "sparse"
        b = latents.shape[0]
        tlen = jnp.full((b,), min(226, self.text_len), jnp.int32)
        ofs_val = 2.0 if (condition is not None or self.is_i2v) else 0.0
        ofs = (jnp.full((b,), ofs_val)
               if self.model.cfg.use_ofs_embed else None)

        device_sync()
        t0 = time.perf_counter()
        call = 0
        for i, t in enumerate(sched.timesteps):
            ts = jnp.full((b,), float(t))
            model_in = (latents if condition is None
                        else jnp.concatenate([latents, condition], axis=1))
            outs = []
            for text in (text_cond, text_uncond):
                x, ctx, temb, rope = self._embed(self.params, model_in, ts,
                                                 text, ofs)
                if tea.enabled and not tea.should_compute(temb):
                    # the head concatenates ctx with x (norm_final), so the
                    # encoder residual must be re-applied too (reference:
                    # main_cogvideox.py:129-143 previous_residual_encoder)
                    x, ctx = tea.apply_residual(x, ctx)
                else:
                    sparse_now = use_sparse and call >= self.sparse_warm_calls
                    x, ctx, res, res_c = self._blocks(
                        self.params, x, ctx, temb, rope, tlen, sparse_now,
                        want_residual=tea.enabled)
                    if tea.enabled:
                        tea.record_residual_value(res, res_c)
                outs.append(self._head(self.params, x, ctx, temb))
                call += 1
            g = (dynamic_cfg_scale(self.guidance_scale, float(t), steps)
                 if self.use_dynamic_cfg else self.guidance_scale)
            v = classifier_free_guidance(outs[0], outs[1], g)
            latents = sched.step(v, latents, i)
        device_sync(latents)
        self.denoise_seconds = time.perf_counter() - t0
        self.teacache_stats = tea.stats()
        return latents

    def __call__(self, text_cond, text_uncond, condition=None,
                 seed: int = 42, num_steps: Optional[int] = None):
        cfg = self.model.cfg
        rng = jax.random.PRNGKey(seed)
        b = text_cond.shape[0]
        noise_ch = cfg.in_channels - (
            condition.shape[1] if condition is not None else 0)
        latents = jax.random.normal(
            rng, (b, noise_ch, *self.grid), jnp.float32)
        latents = self.denoise(latents, text_cond, text_uncond, condition,
                               num_steps)
        if self.vae_decode is not None:
            return self.vae_decode(latents)
        return latents

"""End-to-end pipeline tests on tiny configs (SURVEY §4 implication (c)):
few-step denoise runs, TeaCache integration, sparse-vs-dense closeness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rectified_spaattn_tpu.models.hunyuan import (
    HunyuanVideoConfig, HunyuanVideoDiT)
from rectified_spaattn_tpu.models.wan import WanConfig, WanDiT
from rectified_spaattn_tpu.pipelines import HunyuanVideoPipeline, WanPipeline


def make_hunyuan_pipe(mode="vanilla", teacache=False, steps=3, **kw):
    cfg = HunyuanVideoConfig.tiny()
    model = HunyuanVideoDiT(cfg)
    height, width, frames = 64, 64, 8     # latent grid 2x4x4 -> tiny
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.zeros((1, 128), bool).at[:, :9].set(True)
    lat = jnp.zeros((1, cfg.in_channels, frames // 4 * cfg.patch_size_t,
                     height // 16 * cfg.patch_size,
                     width // 16 * cfg.patch_size))
    params = model.init(rng, lat, jnp.array([0.0]), text, mask,
                        jnp.array([6000.0]), None, None)
    pipe = HunyuanVideoPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=steps, sa_drop_rate=0.5,
        p_remain_rates=0.5, mode=mode, enable_teacache=teacache,
        rel_l1_thresh=1e9 if teacache else 0.15, text_len=128,
        interpret=True, **kw)
    return pipe, text, mask


def test_hunyuan_pipeline_dense_runs():
    pipe, text, mask = make_hunyuan_pipe("vanilla")
    out = pipe(text, mask, seed=1)
    assert out.shape[0] == 1
    assert np.isfinite(np.asarray(out)).all()
    assert pipe.denoise_seconds > 0


def test_hunyuan_pipeline_deterministic():
    pipe, text, mask = make_hunyuan_pipe("vanilla", steps=2)
    a = np.asarray(pipe(text, mask, seed=7))
    b = np.asarray(pipe(text, mask, seed=7))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(pipe(text, mask, seed=8))
    assert np.abs(a - c).max() > 0


@pytest.mark.slow
def test_hunyuan_pipeline_sparse_close_to_dense():
    pipe_d, text, mask = make_hunyuan_pipe("vanilla", steps=2)
    pipe_s, _, _ = make_hunyuan_pipe("sparse", steps=2)
    pipe_s.params = pipe_d.params
    d = np.asarray(pipe_d(text, mask, seed=3))
    s = np.asarray(pipe_s(text, mask, seed=3))
    rel = np.abs(s - d).mean() / (np.abs(d).mean() + 1e-8)
    assert rel < 0.25, f"sparse pipeline deviates {rel:.3f}"


def test_hunyuan_teacache_skips_steps():
    pipe, text, mask = make_hunyuan_pipe("vanilla", teacache=True, steps=4)
    out = pipe(text, mask, seed=1)
    stats = pipe.teacache_stats
    # huge threshold -> middle steps skipped, first/last computed
    assert stats["computed"] == 2
    assert stats["skipped"] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_hunyuan_density_probe_samples_per_step():
    """density_probe appends one executed-density float per denoise step
    (a sibling jitted program over block 0's real activations)."""
    pipe, text, mask = make_hunyuan_pipe("sparse", steps=2,
                                         density_probe=True)
    pipe(text, mask, seed=1)
    assert len(pipe.density_samples) == 2
    assert all(0.0 < dv <= 1.0 for dv in pipe.density_samples)


def test_hunyuan_teacache_int8_offload_close_to_bf16():
    """int8 residual encode + host offload (the full-depth HBM levers,
    VERDICT r4 #1a) must reproduce the bf16-residual TeaCache run within
    quantization noise — same schedule, same skip counts."""
    pipe_b, text, mask = make_hunyuan_pipe("vanilla", teacache=True,
                                           steps=4)
    pipe_q, _, _ = make_hunyuan_pipe("vanilla", teacache=True, steps=4,
                                     teacache_residual="int8",
                                     teacache_offload=True)
    pipe_q.params = pipe_b.params
    b = np.asarray(pipe_b(text, mask, seed=1))
    q = np.asarray(pipe_q(text, mask, seed=1))
    assert pipe_q.teacache_stats == pipe_b.teacache_stats
    rel = np.abs(q - b).mean() / (np.abs(b).mean() + 1e-8)
    assert rel < 0.02, rel


def test_hunyuan_teacache_schedule_replay():
    """teacache_schedule replays a recorded compute/skip list verbatim
    through the pipeline (the measured-+TeaCache-tier mechanism)."""
    sched = [True, False, True, False]
    pipe, text, mask = make_hunyuan_pipe("vanilla", steps=4,
                                         teacache_schedule=sched)
    out = pipe(text, mask, seed=1)
    assert np.isfinite(np.asarray(out)).all()
    assert pipe.teacache_stats == {"computed": 2, "skipped": 2}


def test_flux_pipeline_and_upscale():
    from rectified_spaattn_tpu.models.flux import FluxConfig, FluxDiT
    from rectified_spaattn_tpu.pipelines import (FluxPipeline,
                                                 FluxUpscalePipeline)
    cfg = FluxConfig.tiny()
    model = FluxDiT(cfg)
    rng = jax.random.PRNGKey(4)
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.zeros((1, 128), bool).at[:, :7].set(True)
    pooled = jax.random.normal(rng, (1, cfg.pooled_dim))
    tokens = jnp.zeros((1, 64, cfg.in_channels))
    params = model.init(rng, tokens, jnp.array([0.5]), text, pooled,
                        jnp.array([3.5]), 8, 8)

    def mk(hh, ww):
        return FluxPipeline(model=model, params=params, height=hh, width=ww,
                            num_steps=2, sa_drop_rate=0.5, mode="vanilla",
                            text_len=128, interpret=True)
    pipe = FluxUpscalePipeline(base=mk(128, 128), up=mk(256, 256))
    out = pipe(text, mask, pooled, seed=0)
    assert out.shape == (1, 16 * 16, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()
    # sparse mode on the high-res stage
    pipe.up.mode = "sparse"
    out_s = pipe.up(text, mask, pooled, seed=0)
    assert np.isfinite(np.asarray(out_s)).all()


def test_cogvideox_pipeline_runs():
    from rectified_spaattn_tpu.models.cogvideox import (CogVideoXConfig,
                                                        CogVideoXDiT)
    from rectified_spaattn_tpu.pipelines import CogVideoXPipeline
    cfg = CogVideoXConfig.tiny()
    model = CogVideoXDiT(cfg)
    rng = jax.random.PRNGKey(5)
    text_c = jax.random.normal(rng, (1, 128, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lat = jnp.zeros((1, cfg.in_channels, 2, 8, 8))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)
    pipe = CogVideoXPipeline(
        model=model, params=params, height=64, width=64, frames=9,
        num_steps=2, sa_drop_rate=0.5, mode="vanilla", text_len=128,
        interpret=True)
    out = pipe(text_c, text_u, seed=3)
    assert np.isfinite(np.asarray(out)).all()
    assert pipe.denoise_seconds > 0


def test_wan22_a14b_dual_transformer_routing():
    from rectified_spaattn_tpu.pipelines import Wan22A14BPipeline
    cfg = WanConfig.tiny()
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(6)
    text_c = jax.random.normal(rng, (1, 16, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lat_init = jnp.zeros((1, cfg.in_channels, 2, 4, 4))
    params_h = model.init(rng, lat_init, jnp.array([0.0]), text_c)
    params_l = model.init(jax.random.PRNGKey(7), lat_init,
                          jnp.array([0.0]), text_c)

    def mk(params):
        return WanPipeline(model=model, params=params, height=64, width=64,
                           frames=5, num_steps=4, sa_drop_rate=0.5,
                           mode="vanilla", scheduler="euler",
                           interpret=True)
    # boundary 0.7: flow_shift 5.0 puts the 4-step schedule at
    # [1000, 937, 833, 625], so the LOW transformer actually executes the
    # last step (a 0.5 boundary never crossed — routing was untested)
    pipe = Wan22A14BPipeline(high=mk(params_h), low=mk(params_l),
                             boundary_ratio=0.7)
    lat = jax.random.normal(rng, (1, cfg.in_channels, *pipe.high.grid))
    out = pipe.denoise(lat, text_c, text_u, num_steps=4)
    assert np.isfinite(np.asarray(out)).all()
    assert pipe.denoise_seconds > 0
    # prove the boundary was crossed: the low tree (different init) must
    # change the output vs routing every step to HIGH
    pipe_hh = Wan22A14BPipeline(high=mk(params_h), low=mk(params_h),
                                boundary_ratio=0.7)
    out_hh = pipe_hh.denoise(lat, text_c, text_u, num_steps=4)
    assert np.abs(np.asarray(out_hh) - np.asarray(out)).max() > 0

    # host_swap (VERDICT r4 #4): both trees host-resident, the low tree
    # device-placed once at the boundary — must be value-identical to
    # the co-resident run, twice in a row (the second denoise re-loads
    # the high tree after the previous boundary swap)
    def mk_host(params):
        return WanPipeline(model=model, params=jax.device_get(params),
                           height=64, width=64,
                           frames=5, num_steps=4, sa_drop_rate=0.5,
                           mode="vanilla", scheduler="euler",
                           interpret=True, defer_device=True)
    pipe_hs = Wan22A14BPipeline(high=mk_host(params_h),
                                low=mk_host(params_l),
                                boundary_ratio=0.7, host_swap=True)
    for _ in range(2):
        out_hs = pipe_hs.denoise(lat, text_c, text_u, num_steps=4)
        np.testing.assert_allclose(np.asarray(out_hs), np.asarray(out),
                                   rtol=1e-6, atol=1e-6)
    assert pipe_hs.swap_seconds > 0


def test_wan_pipeline_cfg_runs():
    cfg = WanConfig.tiny()
    model = WanDiT(cfg)
    height, width, frames = 32, 32, 5
    rng = jax.random.PRNGKey(1)
    text_c = jax.random.normal(rng, (1, 16, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lat = jnp.zeros((1, cfg.in_channels,
                     (frames + 3) // 4 * cfg.patch_size[0],
                     height // 16 * cfg.patch_size[1],
                     width // 16 * cfg.patch_size[2]))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)
    pipe = WanPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=2, sa_drop_rate=0.5, mode="vanilla",
        interpret=True)
    out = pipe(text_c, text_u, seed=2)
    assert np.isfinite(np.asarray(out)).all()


def _fake_vae_encode(zc):
    """Deterministic pixels->latents stand-in: resize to the latent grid
    and project channels by tiling (tests only; real path uses VAEEncoder)."""
    def enc(video, grid):
        b, c, f, hh, ww = video.shape
        z = jax.image.resize(video, (b, c, *grid), "linear")
        reps = (zc + c - 1) // c
        return jnp.tile(z, (1, reps, 1, 1, 1))[:, :zc]
    return enc


def test_wan_i2v_conditioned_latents_shape_and_dependence():
    """Wan2.1 I2V spine (reference main_wan21i2v.py:230-248): 36-channel
    analogue — the output must depend on the conditioning image."""
    from rectified_spaattn_tpu.pipelines.wan import i2v_condition

    zc = 4
    cfg = WanConfig.tiny(in_channels=4 + 4 + zc, out_channels=4)
    model = WanDiT(cfg)
    height, width, frames = 32, 32, 5
    rng = jax.random.PRNGKey(3)
    text_c = jax.random.normal(rng, (1, 16, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lt, lh, lw = (frames + 3) // 4, height // 16, width // 16
    grid = (lt * cfg.patch_size[0], lh * cfg.patch_size[1],
            lw * cfg.patch_size[2])
    lat = jnp.zeros((1, cfg.in_channels, *grid))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)
    pipe = WanPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=2, sa_drop_rate=0.5, mode="vanilla",
        interpret=True)

    enc = _fake_vae_encode(zc)
    outs = []
    for seed in (0, 1):
        img = jax.random.normal(jax.random.PRNGKey(seed),
                                (1, 3, height, width))
        cond = i2v_condition(img, frames,
                             lambda v: enc(v, grid), lt=grid[0])
        assert cond.shape == (1, 4 + zc, *grid)
        outs.append(np.asarray(pipe(text_c, text_u, condition=cond,
                                    seed=7)))
    assert np.isfinite(outs[0]).all()
    # same noise seed, different image -> different output
    assert np.abs(outs[0] - outs[1]).max() > 1e-6


def test_wan_ti2v_image_mode_holds_first_frame():
    """Wan2.2 TI2V-5B image mode: first latent frame fixed to the encoded
    image, its tokens denoised at per-token timestep 0."""
    from rectified_spaattn_tpu.pipelines.wan import ti2v_first_frame

    cfg = WanConfig.tiny(per_token_timesteps=True)
    model = WanDiT(cfg)
    height, width, frames = 32, 32, 5
    rng = jax.random.PRNGKey(4)
    text_c = jax.random.normal(rng, (1, 16, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lt, lh, lw = (frames + 3) // 4, height // 16, width // 16
    grid = (lt * cfg.patch_size[0], lh * cfg.patch_size[1],
            lw * cfg.patch_size[2])
    lat = jnp.zeros((1, cfg.in_channels, *grid))
    n_tok = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    params = model.init(rng, lat, jnp.zeros((1, n_tok)), text_c)
    pipe = WanPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=2, sa_drop_rate=0.5, mode="vanilla",
        scheduler="euler", interpret=True)

    enc = _fake_vae_encode(cfg.in_channels)
    img = jax.random.normal(jax.random.PRNGKey(9), (1, 3, height, width))
    ff = ti2v_first_frame(img, lambda v: enc(v, (1, *grid[1:])))
    assert ff.shape == (1, cfg.in_channels, 1, *grid[1:])
    out = pipe(text_c, text_u, first_frame=ff, seed=11)
    np.testing.assert_allclose(np.asarray(out[:, :, :1]), np.asarray(ff),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_cogvideox_i2v_condition_consumed():
    """CogVideoX I2V: channel-concat image latents change the output
    (reference main_cogvideox.py:213-222; diffusers channel concat)."""
    from rectified_spaattn_tpu.models.cogvideox import (CogVideoXConfig,
                                                        CogVideoXDiT)
    from rectified_spaattn_tpu.pipelines import CogVideoXPipeline
    from rectified_spaattn_tpu.pipelines.cogvideox import cog_i2v_condition

    zc = 4
    cfg = CogVideoXConfig.tiny()
    import dataclasses as dc
    cfg = dc.replace(cfg, in_channels=2 * zc, out_channels=zc)
    model = CogVideoXDiT(cfg)
    rng = jax.random.PRNGKey(5)
    text_c = jax.random.normal(rng, (1, 128, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    height, width, frames = 32, 32, 9
    lt = (frames - 1) // 8 + 1
    grid = (lt, height // 16 * cfg.patch_size, width // 16 * cfg.patch_size)
    lat = jnp.zeros((1, cfg.in_channels, *grid))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)
    pipe = CogVideoXPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=2, sa_drop_rate=0.5, mode="vanilla",
        text_len=128, is_i2v=True, interpret=True)

    def enc(video):
        b, c, f, hh, ww = video.shape
        z = jax.image.resize(video, (b, c, 1, *grid[1:]), "linear")
        return jnp.tile(z, (1, 2, 1, 1, 1))[:, :zc]

    outs = []
    for s_ in (0, 1):
        img = jax.random.normal(jax.random.PRNGKey(s_),
                                (1, 3, height, width))
        cond = cog_i2v_condition(img, enc, grid)
        assert cond.shape == (1, zc, *grid)
        # only the first latent frame carries the image
        assert float(jnp.abs(cond[:, :, 1:]).max()) == 0.0
        outs.append(np.asarray(pipe(text_c, text_u, condition=cond,
                                    seed=3)))
    assert np.isfinite(outs[0]).all()
    assert np.abs(outs[0] - outs[1]).max() > 1e-6


@pytest.mark.slow
def test_flux_controlnet_conditions_the_upscale():
    """Flux upscaler parity (reference main_upflux.py:287-328): with a
    ControlNet the second stage starts from noise and the BASE IMAGE must
    shape the 4x output through the residuals; zero-init params make the
    ControlNet an exact no-op."""
    from rectified_spaattn_tpu.models.flux import (
        FluxConfig, FluxDiT, FluxControlNet, FluxControlNetConfig)
    from rectified_spaattn_tpu.pipelines import (FluxPipeline,
                                                 FluxUpscalePipeline)

    cfg = FluxConfig.tiny()
    model = FluxDiT(cfg)
    rng = jax.random.PRNGKey(6)
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.ones((1, 128), bool)
    pooled = jax.random.normal(rng, (1, cfg.pooled_dim))
    tokens = jnp.zeros((1, 64, cfg.in_channels))
    params = model.init(rng, tokens, jnp.array([0.5]), text, pooled,
                        jnp.array([3.5]), 8, 8)

    cn_cfg = FluxControlNetConfig.tiny()
    cn = FluxControlNet(cn_cfg)
    cn_params = cn.init(rng, tokens, tokens, jnp.array([0.5]), text,
                        pooled, jnp.array([3.5]), 8, 8)

    def mk(hw, steps=2):
        return FluxPipeline(model=model, params=params, height=hw,
                            width=hw, num_steps=steps, sa_drop_rate=0.5,
                            mode="vanilla", text_len=128, interpret=True)

    # zero-init => exact no-op: conditioned == unconditioned (same seed)
    pipe0 = FluxUpscalePipeline(base=mk(64), up=mk(128), controlnet=cn,
                                controlnet_params=cn_params)
    out_cn = np.asarray(pipe0(text, mask, pooled, seed=1))
    pipe_plain = FluxUpscalePipeline(base=mk(64), up=mk(128))
    # force the same pure-noise init for a fair comparison
    pipe_plain.strength = 1.0
    out_plain = np.asarray(pipe_plain(text, mask, pooled, seed=1))
    np.testing.assert_allclose(out_cn, out_plain, rtol=1e-5, atol=1e-6)

    # randomized projections => base image shapes the output
    cn_params2 = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(
            jax.random.PRNGKey(8), x.shape, x.dtype), cn_params)
    outs = []
    for seed_base in (1, 2):
        # different base seeds -> different control images, same up noise
        p = FluxUpscalePipeline(base=mk(64), up=mk(128), controlnet=cn,
                                controlnet_params=cn_params2)
        base_tokens = p.base(text, mask, pooled, seed=seed_base)
        b = base_tokens.shape[0]
        grid = base_tokens.reshape(b, 4, 4, -1)
        grid = jnp.repeat(jnp.repeat(grid, 2, axis=1), 2, axis=2)
        control = grid.reshape(b, 64, -1)
        control_h = jnp.take(control, p.up.h2l, axis=1)
        fn = p._controlnet_fn(control_h, text, pooled)
        outs.append(np.asarray(p.up(text, mask, pooled, seed=99,
                                    controlnet_fn=fn)))
    assert np.isfinite(outs[0]).all()
    assert np.abs(outs[0] - outs[1]).max() > 1e-6


def test_bf16_params_run_bf16_activations():
    """bf16 params (real-checkpoint dtype) must run the block stack in
    bf16 — jnp promotion would silently run video-scale activations in
    fp32 (2x HBM traffic vs the reference's bf16 transformer)."""
    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.models.hunyuan import (HunyuanVideoConfig,
                                                      HunyuanVideoDiT)
    from rectified_spaattn_tpu.pipelines import HunyuanVideoPipeline

    cfg = HunyuanVideoConfig.tiny()
    model = HunyuanVideoDiT(cfg)
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 32, cfg.text_dim), jnp.float32)
    mask = jnp.ones((1, 32), bool)
    lat = jnp.zeros((1, cfg.in_channels, 2, 16, 16))
    params = model.init(rng, lat, jnp.array([0.0]), text, mask,
                        jnp.array([6000.0]), None, None)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    pipe = HunyuanVideoPipeline(
        model=model, params=params, height=256, width=256, frames=8,
        num_steps=2, mode="vanilla", interpret=True)
    assert pipe.compute_dtype == jnp.bfloat16
    x, ctx, temb, rope, sig = pipe._embed(
        params, jax.random.normal(rng, (1, cfg.in_channels, *pipe.grid)),
        jnp.array([500.0]), text, mask, jnp.array([6000.0]), None)
    assert x.dtype == jnp.bfloat16 and ctx.dtype == jnp.bfloat16
    out = pipe(text, mask, seed=0)
    import numpy as np
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_bf16_params_cast_all_families():
    """Every pipeline's embed seam casts activations to the param dtype."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rectified_spaattn_tpu.models.wan import WanConfig, WanDiT
    from rectified_spaattn_tpu.pipelines import WanPipeline

    cfg = WanConfig.tiny()
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 16, cfg.text_dim), jnp.float32)
    lat = jnp.zeros((1, cfg.in_channels, 2, 16, 16))
    params = model.init(rng, lat, jnp.array([0.0]), text, None)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    pipe = WanPipeline(model=model, params=params, height=256, width=256,
                       frames=9, num_steps=2, mode="vanilla",
                       interpret=True, warm_calls=0)
    assert pipe.compute_dtype == jnp.bfloat16
    out = pipe(text, text, seed=0)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_wan_pipeline_sparse_close_to_dense():
    """Per-family latent A/B bound (ROADMAP eval item): sparse vs dense
    mean relative error at the tiny config, mirroring
    eval_image_diff.py's dense-reference comparison."""
    cfg = WanConfig.tiny()
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(2)
    text_c = jax.random.normal(rng, (1, 16, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lat = jnp.zeros((1, cfg.in_channels, 2, 4, 4))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)

    def mk(mode):
        return WanPipeline(model=model, params=params, height=64, width=64,
                           frames=5, num_steps=2, sa_drop_rate=0.5,
                           warm_layers=0, warm_calls=0,
                           mode=mode, interpret=True)
    d = np.asarray(mk("vanilla")(text_c, text_u, seed=3))
    s = np.asarray(mk("sparse")(text_c, text_u, seed=3))
    rel = np.abs(s - d).mean() / (np.abs(d).mean() + 1e-8)
    assert rel < 0.25, f"wan sparse deviates {rel:.3f}"


@pytest.mark.slow
def test_cogvideox_pipeline_sparse_close_to_dense():
    from rectified_spaattn_tpu.models.cogvideox import (CogVideoXConfig,
                                                        CogVideoXDiT)
    from rectified_spaattn_tpu.pipelines import CogVideoXPipeline
    cfg = CogVideoXConfig.tiny()
    model = CogVideoXDiT(cfg)
    rng = jax.random.PRNGKey(5)
    text_c = jax.random.normal(rng, (1, 128, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lat = jnp.zeros((1, cfg.in_channels, 2, 8, 8))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)

    def mk(mode):
        return CogVideoXPipeline(
            model=model, params=params, height=64, width=64, frames=9,
            num_steps=2, sa_drop_rate=0.5, mode=mode, text_len=128,
            sparse_warm_calls=0, interpret=True)
    d = np.asarray(mk("vanilla")(text_c, text_u, seed=3))
    s = np.asarray(mk("sparse")(text_c, text_u, seed=3))
    rel = np.abs(s - d).mean() / (np.abs(d).mean() + 1e-8)
    assert rel < 0.25, f"cog sparse deviates {rel:.3f}"


def test_flux_pipeline_sparse_close_to_dense():
    from rectified_spaattn_tpu.models.flux import FluxConfig, FluxDiT
    from rectified_spaattn_tpu.pipelines import FluxPipeline
    cfg = FluxConfig.tiny()
    model = FluxDiT(cfg)
    rng = jax.random.PRNGKey(4)
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.zeros((1, 128), bool).at[:, :7].set(True)
    pooled = jax.random.normal(rng, (1, cfg.pooled_dim))
    tokens = jnp.zeros((1, 64, cfg.in_channels))
    params = model.init(rng, tokens, jnp.array([0.5]), text, pooled,
                        jnp.array([3.5]), 8, 8)

    def mk(mode):
        return FluxPipeline(model=model, params=params, height=256,
                            width=256, num_steps=2, sa_drop_rate=0.5,
                            mode=mode, text_len=128,
                            sparse_layer_gate=(99, 99), interpret=True)
    d = np.asarray(mk("vanilla")(text, mask, pooled, seed=3))
    s = np.asarray(mk("sparse")(text, mask, pooled, seed=3))
    rel = np.abs(s - d).mean() / (np.abs(d).mean() + 1e-8)
    assert rel < 0.25, f"flux sparse deviates {rel:.3f}"


def make_hunyuan_i2v_pipe(mode="vanilla", steps=3):
    import dataclasses
    cfg = dataclasses.replace(HunyuanVideoConfig.tiny(),
                              image_condition_type="token_replace")
    model = HunyuanVideoDiT(cfg)
    height, width, frames = 64, 64, 8
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.zeros((1, 128), bool).at[:, :9].set(True)
    lat = jnp.zeros((1, cfg.in_channels, frames // 4 * cfg.patch_size_t,
                     height // 16 * cfg.patch_size,
                     width // 16 * cfg.patch_size))
    params = model.init(rng, lat, jnp.array([0.0]), text, mask,
                        jnp.array([6000.0]), None, None)
    pipe = HunyuanVideoPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=steps, sa_drop_rate=0.5,
        p_remain_rates=0.5, mode=mode, text_len=128, interpret=True)
    return pipe, text, mask, lat.shape


def test_hunyuan_token_replace_holds_first_frame():
    """token_replace I2V (diffusers HunyuanVideo-I2V 720p): the clean
    first latent frame is held in the stream every step and returned
    unchanged; later frames are actually denoised."""
    pipe, text, mask, lat_shape = make_hunyuan_i2v_pipe()
    b, c, t, hh, ww = lat_shape
    first = jax.random.normal(jax.random.PRNGKey(8), (b, c, 1, hh, ww))
    out = pipe(text, mask, seed=1, first_frame=first)
    np.testing.assert_allclose(np.asarray(out[:, :, :1]),
                               np.asarray(first), rtol=0, atol=0)
    assert np.isfinite(np.asarray(out)).all()
    # the conditioning changes the denoise of the later frames too
    out2 = pipe(text, mask, seed=1, first_frame=2.0 * first)
    assert np.abs(np.asarray(out2[:, :, 1:]) -
                  np.asarray(out[:, :, 1:])).max() > 1e-6


def test_hunyuan_token_replace_select_is_noop_when_embs_equal():
    """Wiring check: when the alt conditioning vector EQUALS the step
    conditioning, the per-token modulation select must be exactly the
    plain path (run_blocks and head bit-identical)."""
    pipe, text, mask, lat_shape = make_hunyuan_i2v_pipe()
    ts = jnp.array([500.0])
    guidance = jnp.array([6000.0])
    lat = jax.random.normal(jax.random.PRNGKey(2), lat_shape)
    m = pipe.model
    x, ctx, temb, rope = m.apply(
        pipe.params, lat, ts, text, mask, guidance, pipe.h2l,
        method=HunyuanVideoDiT.embed)
    plain = m.apply(pipe.params, x, ctx, temb, rope,
                    pipe.site.attn_fn("vanilla", interpret=True),
                    method=HunyuanVideoDiT.run_blocks)
    sel = m.apply(pipe.params, x, ctx, temb, rope,
                  pipe.site.attn_fn("vanilla", interpret=True),
                  temb, pipe._ff_mask_curve,
                  method=HunyuanVideoDiT.run_blocks)
    np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(sel[0]))
    t, hh, ww = pipe.grid
    h_plain = m.apply(pipe.params, plain[0], temb, pipe.l2h, t, hh, ww,
                      method=HunyuanVideoDiT.head)
    h_sel = m.apply(pipe.params, plain[0], temb, pipe.l2h, t, hh, ww,
                    temb, pipe._ff_mask_linear,
                    method=HunyuanVideoDiT.head)
    np.testing.assert_array_equal(np.asarray(h_plain), np.asarray(h_sel))
    # and with a DIFFERENT alt conditioning only the masked tokens move
    temb0 = m.apply(pipe.params, text, mask, guidance,
                    method=HunyuanVideoDiT.token_replace_temb)
    h_tr = m.apply(pipe.params, plain[0], temb, pipe.l2h, t, hh, ww,
                   temb0, pipe._ff_mask_linear,
                   method=HunyuanVideoDiT.head)
    diff = np.abs(np.asarray(h_tr) - np.asarray(h_plain))
    assert diff[:, :, :1].max() > 1e-6          # first frame moved
    np.testing.assert_array_equal(diff[:, :, 1:], 0)   # others did not


def test_hunyuan_latent_concat_i2v():
    """latent_concat I2V (diffusers HunyuanVideo-I2V v1, in_channels 33):
    noise carries out_channels, the condition fills the remaining input
    channels every step, and changing the condition changes the result."""
    import dataclasses
    cfg = dataclasses.replace(
        HunyuanVideoConfig.tiny(), in_channels=9, out_channels=4,
        image_condition_type="latent_concat")      # 4 noise + 4 z + 1 mask
    model = HunyuanVideoDiT(cfg)
    height, width, frames = 64, 64, 8
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.zeros((1, 128), bool).at[:, :9].set(True)
    lat = jnp.zeros((1, cfg.in_channels, frames // 4 * cfg.patch_size_t,
                     height // 16 * cfg.patch_size,
                     width // 16 * cfg.patch_size))
    params = model.init(rng, lat, jnp.array([0.0]), text, mask,
                        jnp.array([6000.0]), None, None)
    pipe = HunyuanVideoPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=2, sa_drop_rate=0.5, p_remain_rates=0.5,
        mode="vanilla", text_len=128, interpret=True)

    from rectified_spaattn_tpu.pipelines.hunyuan import i2v_condition_concat
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 3, height, width))
    lt = pipe.grid[0]

    def vae_encode(video_px):
        # stand-in encoder: pool pixels onto the latent grid, 4 channels
        z = jax.image.resize(video_px.astype(jnp.float32),
                             (1, 3, lt, *pipe.grid[1:]), "linear")
        return jnp.concatenate([z, z[:, :1]], axis=1)

    cond = i2v_condition_concat(img, frames, vae_encode, lt)
    assert cond.shape == (1, 5, lt, *pipe.grid[1:])
    # mask channel: 1 on the first latent frame, 0 after
    np.testing.assert_array_equal(np.asarray(cond[:, -1, 0]), 1.0)
    np.testing.assert_array_equal(np.asarray(cond[:, -1, 1:]), 0.0)

    out = pipe(text, mask, seed=1, condition=cond)
    assert out.shape == (1, cfg.out_channels, *pipe.grid)
    assert np.isfinite(np.asarray(out)).all()
    out2 = pipe(text, mask, seed=1, condition=2.0 * cond)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-6

"""Scan-over-blocks execution (models/scan.py): stacked-param round trips,
equivalence with the unrolled run_blocks, and the pipeline-level scan mode
(including composed with weight-only quantization — the full-depth
flagship serving configuration)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rectified_spaattn_tpu.models.hunyuan import (
    HunyuanVideoConfig, HunyuanVideoDiT)
from rectified_spaattn_tpu.models.scan import (
    hunyuan_run_blocks_scan, hunyuan_teacache_signal_scan,
    stack_block_params, unstack_block_params)
from rectified_spaattn_tpu.models.quant import quantize_params


@pytest.fixture(scope="module")
def tiny3():
    """Tiny Hunyuan with DEPTH (3 dual + 3 single) so the scan actually
    iterates."""
    cfg = HunyuanVideoConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "num_dual_blocks": 3,
                       "num_single_blocks": 3})
    model = HunyuanVideoDiT(cfg)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (1, cfg.in_channels, 2, 8, 8))
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.text_dim))
    mask = jnp.ones((1, 16), bool)
    params = model.init(rng, lat, jnp.array([500.0]), text, mask,
                        jnp.array([6000.0]), None, None)
    return cfg, model, params, lat, text, mask


def test_stack_unstack_roundtrip(tiny3):
    cfg, model, params, *_ = tiny3
    inner = dict(params["params"])
    rest, stacked = stack_block_params(inner, "dual_", cfg.num_dual_blocks)
    assert "dual_0" not in rest and "single_0" in rest
    back = unstack_block_params(stacked, "dual_")
    for i in range(cfg.num_dual_blocks):
        a = jax.tree_util.tree_leaves(back[f"dual_{i}"])
        b = jax.tree_util.tree_leaves(inner[f"dual_{i}"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_scan_matches_unrolled_run_blocks(tiny3):
    cfg, model, params, lat, text, mask = tiny3
    x, ctx, temb, rope = model.apply(
        params, lat, jnp.array([500.0]), text, mask, jnp.array([6000.0]),
        None, None, method=HunyuanVideoDiT.embed)
    from rectified_spaattn_tpu.attention import attention
    fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
    x_u, ctx_u = model.apply(params, x, ctx, temb, rope, fn,
                             method=HunyuanVideoDiT.run_blocks)

    inner = dict(params["params"])
    inner, dual = stack_block_params(inner, "dual_", cfg.num_dual_blocks)
    inner, single = stack_block_params(inner, "single_",
                                       cfg.num_single_blocks)
    x_s, ctx_s = hunyuan_run_blocks_scan(cfg, dual, single, x, ctx, temb,
                                         rope, fn)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_u),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ctx_s), np.asarray(ctx_u),
                               rtol=2e-5, atol=2e-5)

    sig_u = model.apply(params, x, temb,
                        method=HunyuanVideoDiT.teacache_signal)
    sig_s = hunyuan_teacache_signal_scan(cfg, dual, x, temb)
    np.testing.assert_allclose(np.asarray(sig_s), np.asarray(sig_u),
                               rtol=1e-6, atol=1e-6)


def test_single_block_jit_matches_eager(tiny3):
    """Regression: XLA:CPU miscompiled the RoPE `.at[:, :, :sv].set()`
    dynamic-update-slice when fused into the attention dot — jitted
    SingleStreamBlock output deviated ~10%% from the fp64 oracle while
    eager was correct.  layers.py now concatenates instead; this pins
    jit == eager through the whole block."""
    from rectified_spaattn_tpu.models.layers import SingleStreamBlock
    cfg, model, params, lat, text, mask = tiny3
    x, ctx, temb, rope = model.apply(
        params, lat, jnp.array([500.0]), text, mask, jnp.array([6000.0]),
        None, None, method=HunyuanVideoDiT.embed)
    from rectified_spaattn_tpu.attention import attention
    fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
    blk = SingleStreamBlock(cfg.hidden_dim, cfg.heads, cfg.mlp_mult)
    p0 = {"params": params["params"]["single_0"]}
    xe, ce = blk.apply(p0, x, ctx, temb, rope, fn)
    xj, cj = jax.jit(lambda p, a, b: blk.apply(p, a, b, temb, rope, fn))(
        p0, x, ctx)
    np.testing.assert_allclose(np.asarray(xj), np.asarray(xe),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cj), np.asarray(ce),
                               rtol=1e-5, atol=1e-5)


def test_scan_paths_thread_mlp_chunk(tiny3, monkeypatch):
    """cfg.mlp_chunk must reach EVERY scan-path block constructor — it was
    silently a no-op under scan_blocks (ADVICE r4 medium), which is exactly
    the full-depth serving mode the peak-HBM lever exists for.  The lever
    is math-identical, so equality tests cannot catch the drop; this pins
    the constructor wiring directly, then checks scan output equality with
    chunking actually engaged."""
    import dataclasses
    import rectified_spaattn_tpu.models.scan as scan_mod
    from rectified_spaattn_tpu.models.wan import WanConfig

    class _Stop(Exception):
        pass

    seen = {}

    def recorder(name):
        # records the ctor kwarg, then aborts at first use so the scan
        # fns can be probed without real params
        class _Rec:
            def __init__(self, *a, **k):
                seen[name] = k.get("mlp_chunk", 1)

            def apply(self, *a, **k):
                raise _Stop
        return _Rec

    cfg, model, params, lat, text, mask = tiny3
    cfg3 = dataclasses.replace(cfg, mlp_chunk=3)
    wcfg3 = dataclasses.replace(WanConfig.tiny(), mlp_chunk=3)

    for fn, args, names in (
        (scan_mod.hunyuan_run_blocks_scan,
         (cfg3, None, None, None, None, None, None, None),
         ("DualStreamBlock", "SingleStreamBlock")),
        (scan_mod.hunyuan_run_phase_scan,
         (cfg3, None, "dual", None, None, None, None, None, 0, 1),
         ("DualStreamBlock",)),
        (scan_mod.hunyuan_run_phase_scan,
         (cfg3, None, "single", None, None, None, None, None, 0, 1),
         ("SingleStreamBlock",)),
        (scan_mod.wan_run_blocks_scan,
         (wcfg3, None, None, None, None, None, None, [], None),
         ("CrossAttnBlock",)),
        (scan_mod.wan_run_window_scan,
         (wcfg3, None, None, None, None, None, None, None, None, 0, 1),
         ("CrossAttnBlock",)),
        (scan_mod.flux_run_blocks_scan,
         (cfg3, None, None, None, None, None, None, [], []),
         ("DualStreamBlock", "SingleStreamBlock")),
    ):
        seen.clear()
        for n in ("DualStreamBlock", "SingleStreamBlock", "CrossAttnBlock"):
            monkeypatch.setattr(scan_mod, n, recorder(n))
        try:
            fn(*args)
        except Exception:   # _Stop or scan-over-None — ctors already ran
            pass
        for n in names:
            assert seen.get(n) == 3, (fn.__name__, n, seen)
    monkeypatch.undo()

    # behavior: the chunked scan still equals the unchunked scan
    x, ctx, temb, rope = model.apply(
        params, lat, jnp.array([500.0]), text, mask, jnp.array([6000.0]),
        None, None, method=HunyuanVideoDiT.embed)
    from rectified_spaattn_tpu.attention import attention
    fn = lambda q, k, v: attention(q, k, v, mode="vanilla")
    inner = dict(params["params"])
    inner, dual = stack_block_params(inner, "dual_", cfg.num_dual_blocks)
    inner, single = stack_block_params(inner, "single_",
                                       cfg.num_single_blocks)
    x_1, ctx_1 = hunyuan_run_blocks_scan(cfg, dual, single, x, ctx, temb,
                                         rope, fn)
    x_3, ctx_3 = hunyuan_run_blocks_scan(cfg3, dual, single, x, ctx, temb,
                                         rope, fn)
    np.testing.assert_allclose(np.asarray(x_3), np.asarray(x_1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx_3), np.asarray(ctx_1),
                               rtol=1e-5, atol=1e-5)


def _mk_pipe(scan, steps=2, quant_bits=None, mode="vanilla", mesh=None,
             dispatch_segments=1, enable_teacache=False):
    from rectified_spaattn_tpu.pipelines import HunyuanVideoPipeline
    cfg = HunyuanVideoConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "num_dual_blocks": 2,
                       "num_single_blocks": 2})
    model = HunyuanVideoDiT(cfg)
    rng = jax.random.PRNGKey(0)
    height, width, frames = 64, 64, 8
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.zeros((1, 128), bool).at[:, :9].set(True)
    lat = jnp.zeros((1, cfg.in_channels, 2, 8, 8))
    params = model.init(rng, lat, jnp.array([0.0]), text, mask,
                        jnp.array([6000.0]), None, None)
    if quant_bits:
        params = quantize_params(jax.device_get(params), bits=quant_bits,
                                 min_size=1, group_size=32)
    pipe = HunyuanVideoPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=steps, sa_drop_rate=0.5,
        p_remain_rates=0.5, mode=mode, text_len=128,
        interpret=True, scan_blocks=scan, mesh=mesh,
        dispatch_segments=dispatch_segments,
        enable_teacache=enable_teacache,
        rel_l1_thresh=0.15 if enable_teacache else 0.15)
    return pipe, text, mask


def test_pipeline_scan_matches_unrolled():
    pipe_u, text, mask = _mk_pipe(scan=False)
    pipe_s, _, _ = _mk_pipe(scan=True)
    a = np.asarray(pipe_u(text, mask, seed=3))
    b = np.asarray(pipe_s(text, mask, seed=3))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)


def test_pipeline_scan_quantized_runs():
    pipe, text, mask = _mk_pipe(scan=True, quant_bits=8)
    assert "kernel_q" in str(jax.tree_util.tree_structure(pipe.params))
    out = np.asarray(pipe(text, mask, seed=3))
    assert np.isfinite(out).all()
    ref, _, _ = _mk_pipe(scan=False)
    r = np.asarray(ref(text, mask, seed=3))
    rel = np.abs(out - r).mean() / (np.abs(r).mean() + 1e-8)
    assert rel < 0.15, rel


def _mk_wan_pipe(scan, mode="vanilla", quant_bits=None,
                 dispatch_segments=1):
    from rectified_spaattn_tpu.models.wan import WanConfig, WanDiT
    from rectified_spaattn_tpu.pipelines import WanPipeline
    cfg = WanConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "num_blocks": 4})
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
    if quant_bits:
        params = quantize_params(jax.device_get(params), bits=quant_bits,
                                 min_size=1)
    pipe = WanPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=2, sa_drop_rate=0.5, mode=mode,
        warm_layers=1, warm_calls=0, interpret=True, scan_blocks=scan,
        dispatch_segments=dispatch_segments)
    return pipe, text_c, text_u


@pytest.mark.slow
def test_wan_pipeline_scan_matches_unrolled():
    """Scan mode with the reference's per-layer warm gates (dense leading
    layer + sparse middle becomes two scan segments) equals the unrolled
    path."""
    for mode in ("vanilla", "sparse"):
        pipe_u, tc, tu = _mk_wan_pipe(scan=False, mode=mode)
        pipe_s, _, _ = _mk_wan_pipe(scan=True, mode=mode)
        a = np.asarray(pipe_u(tc, tu, seed=3))
        b = np.asarray(pipe_s(tc, tu, seed=3))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4,
                                   err_msg=f"mode={mode}")


def test_wan_pipeline_scan_quantized_runs():
    pipe, tc, tu = _mk_wan_pipe(scan=True, quant_bits=8)
    out = np.asarray(pipe(tc, tu, seed=3))
    assert np.isfinite(out).all()
    ref, _, _ = _mk_wan_pipe(scan=False)
    r = np.asarray(ref(tc, tu, seed=3))
    rel = np.abs(out - r).mean() / (np.abs(r).mean() + 1e-8)
    assert rel < 0.15, rel


def _mk_flux_pipe(scan, mode="vanilla", quant_bits=None, cn=False):
    from rectified_spaattn_tpu.models.flux import (
        FluxConfig, FluxDiT, FluxControlNet, FluxControlNetConfig)
    from rectified_spaattn_tpu.pipelines import FluxPipeline
    cfg = FluxConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "num_dual_blocks": 2,
                       "num_single_blocks": 4})
    model = FluxDiT(cfg)
    rng = jax.random.PRNGKey(4)
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.zeros((1, 128), bool).at[:, :7].set(True)
    pooled = jax.random.normal(rng, (1, cfg.pooled_dim))
    tokens = jnp.zeros((1, 64, cfg.in_channels))
    params = model.init(rng, tokens, jnp.array([0.5]), text, pooled,
                        jnp.array([3.5]), 8, 8)
    if quant_bits:
        params = quantize_params(jax.device_get(params), bits=quant_bits,
                                 min_size=1)
    pipe = FluxPipeline(
        model=model, params=params, height=128, width=128, num_steps=2,
        sa_drop_rate=0.5, mode=mode, text_len=128, interpret=True,
        # pids 0..5: dense band [3,5) => single segs sparse/dense/sparse
        sparse_layer_gate=(3, 5), scan_blocks=scan)
    cn_fn = None
    if cn:
        cn_cfg = FluxControlNetConfig.tiny()
        net = FluxControlNet(cn_cfg)
        cn_params = net.init(rng, tokens, tokens, jnp.array([0.5]), text,
                             pooled, jnp.array([3.5]), 8, 8)
        # randomize the zero-init projections so residuals actually bite
        cn_params = jax.tree.map(
            lambda x: x + 0.05 * jax.random.normal(
                jax.random.PRNGKey(8), x.shape, x.dtype), cn_params)
        control = jax.random.normal(jax.random.PRNGKey(9), tokens.shape)

        def cn_fn(toks, t):
            return net.apply(cn_params, toks, control,
                             jnp.full((toks.shape[0],), t / 1000.0), text,
                             pooled, jnp.array([3.5]), 8, 8)
    return pipe, text, mask, pooled, cn_fn


@pytest.mark.slow
def test_flux_pipeline_scan_matches_unrolled():
    """Scan mode under the reference's sparse layer gate
    (rectified_flux_attn.py:493 — here shrunk to a [3,5) dense band so the
    single stack splits into sparse/dense/sparse segments) equals the
    unrolled path, including interval-distributed ControlNet residuals."""
    for mode, cn in (("vanilla", False), ("sparse", False),
                     ("vanilla", True)):
        pipe_u, text, mask, pooled, fn_u = _mk_flux_pipe(
            scan=False, mode=mode, cn=cn)
        pipe_s, _, _, _, fn_s = _mk_flux_pipe(scan=True, mode=mode, cn=cn)
        a = np.asarray(pipe_u(text, mask, pooled, seed=3,
                              controlnet_fn=fn_u))
        b = np.asarray(pipe_s(text, mask, pooled, seed=3,
                              controlnet_fn=fn_s))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4,
                                   err_msg=f"mode={mode} cn={cn}")


def test_flux_pipeline_scan_quantized_runs():
    pipe, text, mask, pooled, _ = _mk_flux_pipe(scan=True, quant_bits=8)
    out = np.asarray(pipe(text, mask, pooled, seed=3))
    assert np.isfinite(out).all()
    ref, _, _, _, _ = _mk_flux_pipe(scan=False)
    r = np.asarray(ref(text, mask, pooled, seed=3))
    rel = np.abs(out - r).mean() / (np.abs(r).mean() + 1e-8)
    assert rel < 0.15, rel


def _mk_cog_pipe(scan, mode="vanilla", quant_bits=None):
    from rectified_spaattn_tpu.models.cogvideox import (CogVideoXConfig,
                                                        CogVideoXDiT)
    from rectified_spaattn_tpu.pipelines import CogVideoXPipeline
    cfg = CogVideoXConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "num_blocks": 3})
    model = CogVideoXDiT(cfg)
    rng = jax.random.PRNGKey(5)
    text_c = jax.random.normal(rng, (1, 128, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lat = jnp.zeros((1, cfg.in_channels, 2, 8, 8))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)
    if quant_bits:
        params = quantize_params(jax.device_get(params), bits=quant_bits,
                                 min_size=1)
    pipe = CogVideoXPipeline(
        model=model, params=params, height=64, width=64, frames=9,
        num_steps=2, sa_drop_rate=0.5, mode=mode, text_len=128,
        sparse_warm_calls=0, interpret=True, scan_blocks=scan)
    return pipe, text_c, text_u


@pytest.mark.slow
def test_cog_pipeline_scan_matches_unrolled():
    for mode in ("vanilla", "sparse"):
        pipe_u, tc, tu = _mk_cog_pipe(scan=False, mode=mode)
        pipe_s, _, _ = _mk_cog_pipe(scan=True, mode=mode)
        a = np.asarray(pipe_u(tc, tu, seed=3))
        b = np.asarray(pipe_s(tc, tu, seed=3))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4,
                                   err_msg=f"mode={mode}")


@pytest.mark.slow
def test_cog_pipeline_scan_quantized_runs():
    pipe, tc, tu = _mk_cog_pipe(scan=True, quant_bits=8)
    out = np.asarray(pipe(tc, tu, seed=3))
    assert np.isfinite(out).all()
    ref, _, _ = _mk_cog_pipe(scan=False)
    r = np.asarray(ref(tc, tu, seed=3))
    rel = np.abs(out - r).mean() / (np.abs(r).mean() + 1e-8)
    assert rel < 0.15, rel


def test_pipeline_scan_teacache():
    """TeaCache's signal/skip machinery works in scan mode (the signal is
    computed from the stacked tree)."""
    pipe, text, mask = _mk_pipe(scan=True, steps=3)
    pipe.enable_teacache = True
    pipe.rel_l1_thresh = 1e9
    out = np.asarray(pipe(text, mask, seed=1))
    assert np.isfinite(out).all()
    assert pipe.teacache_stats["skipped"] >= 1


@pytest.mark.parametrize("segments", [2, 3])
def test_dispatch_segments_match_single_dispatch(segments):
    """dispatch_segments splits each phase's scan into several JIT
    dispatches (the per-dispatch-watchdog serving mode); results must
    match the one-dispatch scan to float-reassociation tolerance (the
    split changes XLA fusion boundaries), and the TeaCache schedule —
    whose signal comes from the unchanged embed stage — exactly."""
    pipe_1, text, mask = _mk_pipe(scan=True, steps=3, enable_teacache=True)
    pipe_n, _, _ = _mk_pipe(scan=True, steps=3, enable_teacache=True,
                            dispatch_segments=segments)
    a = np.asarray(pipe_1(text, mask, seed=3))
    b = np.asarray(pipe_n(text, mask, seed=3))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    assert pipe_n.teacache_stats == pipe_1.teacache_stats


def test_wan_dispatch_segments_match_single_dispatch():
    """Wan dispatch windows (per gate segment) match the one-dispatch
    scan to float-reassociation tolerance, with the warm dense layer
    exercising the multi-segment path."""
    pipe_1, tc, tu = _mk_wan_pipe(scan=True, mode="sparse")
    pipe_n, _, _ = _mk_wan_pipe(scan=True, mode="sparse",
                                dispatch_segments=2)
    a = np.asarray(pipe_1(tc, tu, seed=3))
    b = np.asarray(pipe_n(tc, tu, seed=3))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)

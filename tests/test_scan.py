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


def _mk_pipe(scan, steps=2, quant_bits=None):
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
                                 min_size=1)
    pipe = HunyuanVideoPipeline(
        model=model, params=params, height=height, width=width,
        frames=frames, num_steps=steps, sa_drop_rate=0.5,
        p_remain_rates=0.5, mode="vanilla", text_len=128,
        interpret=True, scan_blocks=scan)
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


def test_pipeline_scan_teacache():
    """TeaCache's signal/skip machinery works in scan mode (the signal is
    computed from the stacked tree)."""
    pipe, text, mask = _mk_pipe(scan=True, steps=3)
    pipe.enable_teacache = True
    pipe.rel_l1_thresh = 1e9
    out = np.asarray(pipe(text, mask, seed=1))
    assert np.isfinite(out).all()
    assert pipe.teacache_stats["skipped"] >= 1

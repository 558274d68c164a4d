"""Weight-only quantization (models/quant.py): QDense drop-in fidelity,
int8/int4 numerics, stacked-kernel handling, and a quantized tiny-pipeline
end-to-end run.

The reference has no quantized serving path (bf16 torch only,
scripts/main_hunyuan.py:233) — this subsystem exists because 16 GB v5e
HBM cannot hold a 13 GB bf16 flagship next to video-scale activations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from rectified_spaattn_tpu.models.quant import (
    QDense, dequantize_kernel, quantize_params, unpack_int4)


@pytest.fixture(scope="module")
def dense_fixture():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 64))
    qd = QDense(96)
    params = qd.init(rng, x)
    return qd, params, x


def test_qdense_init_tree_matches_nn_dense(dense_fixture):
    qd, params, x = dense_fixture
    pd = nn.Dense(96).init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(pd)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(pd),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qdense_dense_path_matches_nn_dense(dense_fixture):
    qd, params, x = dense_fixture
    y0 = nn.Dense(96).apply(params, x)
    y1 = qd.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_int8_error_bound_and_grid_exactness(dense_fixture):
    qd, params, x = dense_fixture
    y0 = qd.apply(params, x)
    p8 = quantize_params(jax.device_get(params), bits=8, min_size=1)
    y8 = qd.apply(p8, x)
    rel = float(jnp.max(jnp.abs(y8 - y0)) / jnp.max(jnp.abs(y0)))
    assert rel < 0.02, rel

    # A kernel already on the int8 grid quantizes losslessly: the dot is
    # exact (int8 values are exact in fp32/bf16) and the scale is applied
    # to the fp32 accumulator.
    k = np.asarray(params["params"]["kernel"])
    scale = np.abs(k).max(0) / 127.0
    kg = np.rint(k / scale) * scale
    pg = {"params": {"kernel": jnp.asarray(kg, jnp.float32),
                     "bias": params["params"]["bias"]}}
    pg8 = quantize_params(jax.device_get(pg), bits=8, min_size=1)
    np.testing.assert_allclose(dequantize_kernel(pg8["params"]), kg,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(qd.apply(pg8, x)),
                               np.asarray(qd.apply(pg, x)),
                               rtol=2e-6, atol=1e-6)


def test_int8_bf16_activations(dense_fixture):
    qd, params, x = dense_fixture
    xb = x.astype(jnp.bfloat16)
    p8 = quantize_params(jax.device_get(params), bits=8, min_size=1)
    y = qd.apply(p8, xb)
    assert y.dtype == jnp.bfloat16
    y0 = qd.apply(params, x)
    rel = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y0))
                / jnp.max(jnp.abs(y0)))
    assert rel < 0.05, rel


def test_int4_error_bound_and_roundtrip(dense_fixture):
    qd, params, x = dense_fixture
    y0 = qd.apply(params, x)
    p4 = quantize_params(jax.device_get(params), bits=4, group_size=32,
                         min_size=1)
    assert p4["params"]["kernel_q4"].shape == (32, 96)
    assert p4["params"]["kernel_scale"].shape == (2, 96)
    y4 = qd.apply(p4, x)
    rel = float(jnp.max(jnp.abs(y4.astype(jnp.float32) - y0))
                / jnp.max(jnp.abs(y0)))
    assert rel < 0.2, rel
    k = np.asarray(params["params"]["kernel"])
    w4 = dequantize_kernel(p4["params"])
    assert np.max(np.abs(w4 - k)) / np.abs(k).max() < 0.1
    # jit-side unpack agrees with the numpy dequant
    wj = unpack_int4(jnp.asarray(p4["params"]["kernel_q4"]),
                     jnp.asarray(p4["params"]["kernel_scale"]),
                     jnp.float32)
    np.testing.assert_allclose(np.asarray(wj), w4, rtol=1e-6)


def test_stacked_layer_kernels():
    k = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (3, 64, 96)))
    st8 = quantize_params({"kernel": k}, bits=8, min_size=1)
    assert st8["kernel_q"].shape == (3, 64, 96)
    assert st8["kernel_scale"].shape == (3, 96)
    per_layer = quantize_params({"kernel": k[1]}, bits=8, min_size=1)
    np.testing.assert_allclose(dequantize_kernel(st8)[1],
                               dequantize_kernel(per_layer), atol=1e-6)
    st4 = quantize_params({"kernel": k}, bits=4, group_size=32, min_size=1)
    assert st4["kernel_q4"].shape == (3, 32, 96)
    assert st4["kernel_scale"].shape == (3, 2, 96)


def test_quantize_params_threshold_and_skip():
    tree = {"big": {"kernel": np.ones((64, 64), np.float32)},
            "small": {"kernel": np.ones((4, 4), np.float32)},
            "skipped": {"kernel": np.ones((64, 64), np.float32)}}
    out = quantize_params(tree, bits=8, min_size=1024, skip=("skipped",))
    assert "kernel_q" in out["big"] and "kernel" not in out["big"]
    assert "kernel" in out["small"]
    assert "kernel" in out["skipped"]


def test_hunyuan_pipeline_runs_quantized():
    """The tiny flagship pipeline end-to-end on int8 weights: same code
    path the full-depth serving measurement uses (scripts/bench_e2e.py)."""
    from tests.test_pipelines import make_hunyuan_pipe
    pipe, text, mask = make_hunyuan_pipe("vanilla", steps=2)
    ref = np.asarray(pipe(text, mask, seed=3))

    pipe_q, _, _ = make_hunyuan_pipe("vanilla", steps=2)
    pipe_q.params = quantize_params(jax.device_get(pipe.params),
                                    bits=8, min_size=1)
    out = np.asarray(pipe_q(text, mask, seed=3))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert np.isfinite(out).all()
    assert rel < 0.15, rel

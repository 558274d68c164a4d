"""Param checkpoint round-trip (orbax)."""

import numpy as np
import jax.numpy as jnp

from rectified_spaattn_tpu.models.checkpoint import save_params, load_params
import pytest


def test_save_load_roundtrip(tmp_path):
    params = {"params": {"layer": {"kernel": jnp.arange(12.0).reshape(3, 4),
                                   "bias": jnp.zeros(4)},
                         "scale": jnp.ones(3)}}
    path = str(tmp_path / "ckpt")
    save_params(params, path)
    back = load_params(path)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["layer"]["kernel"]),
        np.asarray(params["params"]["layer"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(back["params"]["scale"]), np.ones(3))


@pytest.mark.slow
def test_gated_quality_adapters_report_unavailable():
    from rectified_spaattn_tpu.eval import image_reward, pick_score
    r = image_reward([], [])
    assert r["available"] is False or "image_reward" in r
    # pick_score requires downloading weights — must degrade gracefully
    p = pick_score([], [])
    assert "available" in p

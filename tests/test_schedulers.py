"""Scheduler sanity: monotone sigmas, terminal denoising, and a toy-ODE
integration check for the flow-match samplers."""

import numpy as np
import jax.numpy as jnp
import pytest

from rectified_spaattn_tpu.pipelines import (
    FlowMatchEulerScheduler, UniPCScheduler, CogVideoXDDIMScheduler,
    dynamic_cfg_scale, flux_mu_shift)


def test_euler_sigmas_monotone_and_terminal():
    s = FlowMatchEulerScheduler(20, shift=7.0)
    assert np.all(np.diff(s.sigmas) < 0)
    assert s.sigmas[0] == 1.0 and s.sigmas[-1] == 0.0
    assert len(s.timesteps) == 20


def test_euler_integrates_linear_flow_exactly():
    """For rectified flow with v = (noise - data) constant, Euler recovers
    the data exactly from pure noise regardless of step count."""
    data = jnp.asarray(np.random.default_rng(0).normal(size=(4,)))
    noise = jnp.asarray(np.random.default_rng(1).normal(size=(4,)))
    for steps in (3, 10):
        sched = FlowMatchEulerScheduler(steps, shift=3.0)
        x = noise
        for i in range(steps):
            v = noise - data           # exact velocity field
            x = sched.step(v, x, i)
        np.testing.assert_allclose(np.asarray(x), np.asarray(data),
                                   rtol=1e-4, atol=1e-5)


def test_unipc_integrates_linear_flow():
    data = jnp.asarray(np.random.default_rng(2).normal(size=(4,)))
    noise = jnp.asarray(np.random.default_rng(3).normal(size=(4,)))
    sched = UniPCScheduler(10, shift=5.0)
    x = noise
    for i in range(10):
        sigma = sched.sigmas[i]
        # exact flow sample: x_t = (1-s) data + s noise → v = noise - data
        v = noise - data
        x = sched.step(v, x, i)
    np.testing.assert_allclose(np.asarray(x), np.asarray(data), rtol=2e-2,
                               atol=2e-2)


def test_ddim_terminal_recovers_x0_for_consistent_v():
    """v-prediction consistent with a fixed (x0, eps) pair drives DDIM to
    x0."""
    g = np.random.default_rng(4)
    x0 = jnp.asarray(g.normal(size=(4,)))
    eps = jnp.asarray(g.normal(size=(4,)))
    sched = CogVideoXDDIMScheduler(25)
    t0 = int(sched.timesteps[0])
    a0 = sched.alphas_cum[t0]
    x = (a0 ** 0.5) * x0 + ((1 - a0) ** 0.5) * eps
    for i, t in enumerate(sched.timesteps):
        a_t = sched.alphas_cum[int(t)]
        v = (a_t ** 0.5) * eps - ((1 - a_t) ** 0.5) * x0
        x = sched.step(v, x, i)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3,
                               atol=1e-4)


def test_cog_ddim_trailing_spacing_and_zero_snr():
    """Checkpoint scheduler config parity (THUDM/CogVideoX1.5-5B):
    trailing spacing gives timesteps 999, 979, ..., 19 for 50 steps and
    zero-SNR rescaling zeroes the terminal alpha_bar."""
    s = CogVideoXDDIMScheduler(50)
    ts = s.timesteps
    assert ts[0] == 999 and ts[-1] == 19 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)
    assert s.alphas_cum[-1] == 0.0
    assert abs(s.alphas_cum[0] - (1 - 0.00085)) < 1e-4
    # final step walks to prev_t = -1 -> final_alpha_cum = 1 (set_alpha_to_one)
    assert s.final_alpha_cum == 1.0


def test_dynamic_cfg_matches_diffusers_expression():
    # transliteration of diffusers pipeline_cogvideox.py use_dynamic_cfg:
    # 1 + g * (1 - cos(pi * ((steps - t)/steps)^5)) / 2, keyed on the RAW
    # scheduler timestep
    import math

    def diffusers_expr(g, t, n):
        return 1 + g * ((1 - math.cos(math.pi * ((n - t) / n) ** 5.0)) / 2)

    for t in (999.0, 499.0, 19.0, 0.0):
        assert dynamic_cfg_scale(6.0, t, 50) == diffusers_expr(6.0, t, 50)
    # at the final raw timestep of trailing spacing guidance is near 1
    assert dynamic_cfg_scale(6.0, 19.0, 50) < dynamic_cfg_scale(6.0, 0.0, 50)


def test_flux_mu_shift_monotone_in_seq_len():
    assert flux_mu_shift(4096) > flux_mu_shift(256)

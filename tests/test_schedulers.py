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


def test_dynamic_cfg_ramps():
    lo = dynamic_cfg_scale(6.0, 0, 50)
    hi = dynamic_cfg_scale(6.0, 49, 50)
    assert 1.0 <= lo <= 6.0 and 1.0 <= hi <= 6.0
    assert hi < lo  # guidance decays as steps progress (t -> 0)


def test_flux_mu_shift_monotone_in_seq_len():
    assert flux_mu_shift(4096) > flux_mu_shift(256)

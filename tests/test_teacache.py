"""TeaCache semantics tests against the reference's decision rules."""

import jax.numpy as jnp
import numpy as np

from rectified_spaattn_tpu.cache import TeaCache, rel_l1_signal


def sig(v):
    return jnp.full((4, 8), float(v))


def test_first_and_last_calls_always_compute():
    tc = TeaCache(thresh=1e9, num_steps=5, coefficients="identity")
    decisions = [tc.should_compute(sig(1.0 + 0.001 * i)) for i in range(5)]
    assert decisions[0] is True
    assert decisions[-1] is True
    # with an enormous threshold everything in between is skipped
    assert decisions[1:4] == [False, False, False]


def test_threshold_triggers_compute_and_resets():
    # identity polynomial: accumulated == sum of raw rel-L1 signals
    tc = TeaCache(thresh=0.05, num_steps=10, coefficients="identity")
    vals = [1.0, 1.02, 1.04, 1.06, 1.08, 1.10, 1.12, 1.14, 1.16, 1.18]
    decisions = [tc.should_compute(sig(v)) for v in vals]
    assert decisions[0] is True
    # each step's raw signal ≈ 0.02/1.0 ≈ 0.019 < 0.05 → skip, then the
    # accumulation crosses 0.05 on the 3rd and computes, resetting
    assert decisions[1] is False
    assert decisions[2] is False
    assert decisions[3] is True


def test_cfg_dual_streams_are_independent():
    tc = TeaCache(thresh=0.5, num_steps=8, coefficients="identity",
                  cfg_streams=2)
    # even calls vary a lot (cond), odd calls are constant (uncond)
    seq = []
    for step in range(4):
        seq.append(tc.should_compute(sig(1.0 + step)))      # cond stream
        seq.append(tc.should_compute(sig(2.0)))             # uncond stream
    # call-count window: first cfg_streams calls forced
    assert seq[0] is True and seq[1] is True
    # uncond stream never accumulates signal -> skipped until cutoff
    assert seq[3] is False and seq[5] is False
    # cond stream's large deltas force computes
    assert seq[2] is True


def test_ret_steps_window():
    # Wan use_ret_steps: calls < ret always compute even if unchanged
    tc = TeaCache(thresh=1e9, num_steps=20, coefficients="identity",
                  ret_steps=4, cutoff_steps=18)
    d = [tc.should_compute(sig(1.0)) for _ in range(20)]
    assert d[:4] == [True] * 4
    assert d[4:18] == [False] * 14
    assert d[18:] == [True] * 2


def test_residual_roundtrip():
    tc = TeaCache(thresh=1e9, num_steps=3, coefficients="identity")
    x0 = jnp.ones((2, 3))
    assert tc.should_compute(sig(1.0))
    tc.record_residual(x0, x0 + 5.0)
    assert not tc.should_compute(sig(1.0))
    out = tc.apply_residual(x0 + 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0 + 6.0))
    assert tc.stats() == {"skipped": 1, "computed": 1}


def test_rel_l1_signal_value():
    a = jnp.full((4,), 2.0)
    b = jnp.full((4,), 1.0)
    assert abs(float(rel_l1_signal(a, b)) - 1.0) < 1e-6

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


def test_forced_schedule_replay():
    """forced_schedule replays a recorded compute/skip list verbatim —
    no signal math, calls past the end compute (VERDICT r4 #1b: lets a
    full-depth run execute a calibrated published-regime schedule)."""
    import json
    import tempfile
    from rectified_spaattn_tpu.cache import schedule_from_trace
    sched = [True, False, False, True, False]
    tc = TeaCache(thresh=0.0, num_steps=7, coefficients="identity",
                  forced_schedule=sched)
    assert tc.enabled    # replay enables even at thresh 0
    got = [tc.should_compute(sig(1.0)) for _ in range(7)]
    assert got == sched + [True, True]
    assert tc.stats() == {"skipped": 3, "computed": 4}
    # replay never touches the signal state
    assert tc.states[0].previous_modulated is None

    # round-trip through the trace JSON format (trace_to writer)
    records = [{"meta": {"thresh": 0.2}}] + [
        {"call": i, "stream": 0, "raw": None, "compute": c}
        for i, c in enumerate(sched)]
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(records, f)
        path = f.name
    assert schedule_from_trace(path) == sched


def test_int8_residual_tolerance():
    """The int8 residual encode (cache/teacache.py::residual_value) must
    round-trip within per-row absmax quantization error: |err| <=
    rowmax/254 elementwise, and small relative error on realistic
    residual statistics (the gate VERDICT r4 #1a asks for before the
    full-depth organic run adopts it)."""
    from rectified_spaattn_tpu.cache import residual_value
    from rectified_spaattn_tpu.cache.teacache import _dequant_add
    g = np.random.default_rng(3)
    x_in = jnp.asarray(g.normal(size=(1, 256, 64)), jnp.bfloat16)
    x_out = jnp.asarray(
        np.asarray(x_in, np.float32) + 0.3 * g.normal(size=(1, 256, 64)),
        jnp.bfloat16)
    want = np.asarray(x_out, np.float32)                   # x_in + res
    q, scale = residual_value(x_out, x_in, "int8")
    assert q.dtype == jnp.int8 and scale.dtype == jnp.float32
    got = np.asarray(_dequant_add(x_in, q, scale), np.float32)
    res = want - np.asarray(x_in, np.float32)
    bound = np.abs(res).max(axis=-1, keepdims=True) / 254.0 + 1e-2
    err = np.abs(got - want)
    assert (err <= bound + np.abs(want) * 0.01).all()
    rel = err.mean() / (np.abs(res).mean() + 1e-9)
    assert rel < 0.02, rel
    # bf16 encode stays the old exact path
    r_b = residual_value(x_out, x_in, "bf16")
    assert r_b.dtype == jnp.bfloat16

    # and through the controller: tuple encode + host offload round-trip
    tc = TeaCache(thresh=1e9, num_steps=3, coefficients="identity",
                  offload_residual=True)
    assert tc.should_compute(sig(1.0))
    tc.record_residual_value((q, scale))
    assert isinstance(tc.states[0].previous_residual[0], np.ndarray)
    assert not tc.should_compute(sig(1.0))
    out = np.asarray(tc.apply_residual(x_in), np.float32)
    np.testing.assert_allclose(out, got, rtol=1e-6, atol=1e-6)


def test_rel_l1_signal_value():
    a = jnp.full((4,), 2.0)
    b = jnp.full((4,), 1.0)
    assert abs(float(rel_l1_signal(a, b)) - 1.0) < 1e-6


def test_negative_accumulated_keeps_skipping():
    """Reference compares the SIGNED accumulated value (main_hunyuan.py:121):
    rescale polynomials that go negative keep the skip streak alive."""
    tc = TeaCache(thresh=0.05, num_steps=10, coefficients=[-1.0, 0.0])
    vals = [1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0, 5.5]
    d = [tc.should_compute(sig(v)) for v in vals]
    # big raw deltas, but the polynomial maps them negative -> accumulated
    # only grows more negative -> everything inside the window skips
    assert d[0] is True and d[-1] is True
    assert d[1:9] == [False] * 8


def test_state_keeps_model_dtype():
    """previous_modulated must stay in the incoming dtype (reference keeps
    model dtype) so the rel-L1 signal is not perturbed by a downcast."""
    tc = TeaCache(thresh=0.1, num_steps=6, coefficients="identity")
    tc.should_compute(sig(1.0).astype(jnp.float32))
    assert tc.states[0].previous_modulated.dtype == jnp.float32
    tc2 = TeaCache(thresh=0.1, num_steps=6, coefficients="identity")
    tc2.should_compute(sig(1.0).astype(jnp.bfloat16))
    assert tc2.states[0].previous_modulated.dtype == jnp.bfloat16


def test_skip_schedule_matches_fp32_state_trace():
    """For a bf16-model signal trace, storing the state verbatim (model
    dtype, as the reference does) yields the exact same skip schedule as
    keeping the state in fp32 — bf16→fp32 upcasting is lossless, so our
    state handling adds zero deviation."""
    g = np.random.default_rng(7)
    base = g.normal(size=(64,)).astype(np.float32)
    # smooth multiplicative drift like a denoise trajectory
    trace = [jnp.asarray(
        base * (1.0 + 0.01 * t + 0.002 * g.normal()), jnp.bfloat16)
        for t in range(20)]
    tc_model = TeaCache(thresh=0.08, num_steps=20, coefficients="identity")
    tc_fp32 = TeaCache(thresh=0.08, num_steps=20, coefficients="identity")
    sched_model = [tc_model.should_compute(x) for x in trace]
    sched_fp32 = [tc_fp32.should_compute(x.astype(jnp.float32))
                  for x in trace]
    assert sched_model == sched_fp32
    assert tc_model.states[0].previous_modulated.dtype == jnp.bfloat16


# ---- signal-scale calibration (cache/calibrate.py) ----

def test_signal_scale_multiplies_raw():
    """signal_scale s must make the controller behave as if every raw
    rel-L1 were s*raw: compare against an unscaled controller fed
    tensors whose successive ratios are pre-scaled."""
    from rectified_spaattn_tpu.cache.teacache import trace_to
    g = np.random.default_rng(0)
    raws = np.abs(g.normal(0.05, 0.02, size=18)).astype(np.float64)
    kw = dict(thresh=0.15, num_steps=20, coefficients="hunyuan-video")

    def run(scale, raw_seq):
        tc = TeaCache(signal_scale=scale, **kw)
        val, out = 1.0, []
        for r in [None] + list(raw_seq) + [None]:
            if r is not None:
                val *= (1.0 + r)
            out.append(tc.should_compute(jnp.full((8,), val, jnp.float32)))
        return out

    assert run(3.0, raws) == run(1.0, 3.0 * raws)


def test_simulate_matches_controller():
    """calibrate.simulate_schedule replays TeaCache.should_compute
    exactly over a recorded trace, at scale 1 and at a rescale."""
    from rectified_spaattn_tpu.cache.teacache import trace_to
    from rectified_spaattn_tpu.cache.calibrate import (
        simulate_schedule, trace_raws)
    g = np.random.default_rng(1)
    with trace_to("/tmp/test_calib_trace.json") as rec:
        tc = TeaCache(thresh=0.2, num_steps=40,
                      coefficients="wan2.1-t2v-14b-ret", ret_steps=10,
                      cutoff_steps=40, cfg_streams=2, signal_scale=0.1)
        vals = [1.0, 1.0]
        decisions = []
        for i in range(40):
            vals[i % 2] *= 1.0 + abs(g.normal(0.3, 0.2))
            decisions.append(tc.should_compute(
                jnp.full((8,), vals[i % 2], jnp.float32)))
    meta, raws = trace_raws(rec)
    assert meta["signal_scale"] == 0.1
    assert simulate_schedule(meta, raws, 0.1) == decisions
    # a different scale changes the schedule (sanity that scale matters)
    tc2 = TeaCache(thresh=0.2, num_steps=40,
                   coefficients="wan2.1-t2v-14b-ret", ret_steps=10,
                   cutoff_steps=40, cfg_streams=2, signal_scale=0.02)
    vals = [1.0, 1.0]
    g = np.random.default_rng(1)
    d2 = []
    for i in range(40):
        vals[i % 2] *= 1.0 + abs(g.normal(0.3, 0.2))
        d2.append(tc2.should_compute(
            jnp.full((8,), vals[i % 2], jnp.float32)))
    assert simulate_schedule(meta, raws, 0.02) == d2


def test_solver_hits_target_rate():
    from rectified_spaattn_tpu.cache.calibrate import (
        simulate_schedule, solve_signal_scale, skip_rate)
    g = np.random.default_rng(2)
    meta = {"thresh": 0.2, "num_steps": 100, "ret_steps": 10,
            "cutoff_steps": 100, "cfg_streams": 2,
            "coefficients": [-3.03318725e+05, 4.90537029e+04,
                             -2.65530556e+03, 5.87365115e+01,
                             -3.15583525e-01]}
    raws = [None if (i < 10) else abs(g.normal(0.8, 0.2))
            for i in range(100)]
    scale, predicted = solve_signal_scale(meta, raws, 0.65)
    achieved = skip_rate(simulate_schedule(meta, raws, scale))
    assert achieved == predicted
    assert abs(achieved - 0.65) < 0.10


def test_committed_calibration_matches_traces():
    """The committed calibration summary's achieved rates must equal the
    committed calibrated traces' decision records, and land within 10pts
    of the published targets (VERDICT r3 #3 done-criterion)."""
    import json
    import os
    root = os.path.join(os.path.dirname(__file__), "..", "bench_traces")
    spath = os.path.join(root, "calibration", "summary.json")
    if not os.path.exists(spath):
        import pytest
        pytest.skip("no committed calibration")
    summary = json.load(open(spath))
    assert {"wan21-t2v", "cogvideox-t2v"} <= set(summary)
    for fam, rec in summary.items():
        records = json.load(open(os.path.join(root, rec["trace"])))
        decisions = [bool(r["compute"]) for r in records if "call" in r]
        rate = 1.0 - sum(decisions) / len(decisions)
        assert abs(rate - rec["achieved_skip_rate"]) < 1e-9, fam
        assert abs(rate - rec["target_skip_rate"]) <= 0.10, (fam, rate)


def test_wan_coefficient_auto_resolution():
    """WanPipeline.tea_coefficients picks the reference drivers' tables:
    -ret under use_ret_steps (main_wan21t2v.py:273-286), 480p/720p split
    for I2V, the TI2V-5B table under VAE stride 32."""
    import types
    from rectified_spaattn_tpu.pipelines.wan import WanPipeline

    def fake(**kw):
        base = dict(teacache_coefficients=None,
                    model=types.SimpleNamespace(
                        cfg=types.SimpleNamespace(per_token_timesteps=False)),
                    vae_stride=(4, 16, 16), is_i2v=False, height=720,
                    use_ret_steps=False)
        base.update(kw)
        return types.SimpleNamespace(**base)

    f = WanPipeline.tea_coefficients
    assert f(fake()) == "wan2.1-t2v-14b"
    assert f(fake(use_ret_steps=True)) == "wan2.1-t2v-14b-ret"
    assert f(fake(is_i2v=True, height=480)) == "wan2.1-i2v-480p"
    assert f(fake(is_i2v=True, height=720,
                  use_ret_steps=True)) == "wan2.1-i2v-720p-ret"
    assert f(fake(vae_stride=(4, 32, 32))) == "wan2.2-ti2v-5b"
    assert f(fake(teacache_coefficients="identity")) == "identity"
    # every resolvable key exists in the table
    from rectified_spaattn_tpu.cache.teacache import COEFFICIENTS
    for kw in (dict(), dict(use_ret_steps=True),
               dict(is_i2v=True, height=480),
               dict(is_i2v=True, height=480, use_ret_steps=True),
               dict(is_i2v=True, height=720),
               dict(is_i2v=True, height=720, use_ret_steps=True),
               dict(vae_stride=(4, 32, 32))):
        assert f(fake(**kw)) in COEFFICIENTS

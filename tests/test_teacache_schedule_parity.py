"""TeaCache SKIP-SCHEDULE parity against the reference's own code.

VERDICT r2 item 3: per-call cost numbers were validated in round 2, but
nothing verified that our rel-L1 + polynomial accumulate/reset state
machine reproduces the reference's skip SCHEDULE call-for-call at the
published thresholds.  These tests slice the actual decision blocks out
of the read-only reference drivers (scripts/main_hunyuan.py:114-126
single-stream; scripts/main_wan21t2v.py:105-133 CFG even/odd dual
state), exec them on a synthetic modulated-input trace, and assert our
``TeaCache`` controller makes the identical compute/skip decision at
every call.

Traces are shaped like real runs: large early deltas that decay (the
denoising signal), plus noise — sweeping thresholds so both skip-heavy
and compute-heavy regimes are exercised.
"""

import textwrap
import types

import numpy as np
import torch
import jax.numpy as jnp
import pytest

from rectified_spaattn_tpu.cache import TeaCache
from rectified_spaattn_tpu.cache.teacache import COEFFICIENTS

HUNYUAN_PATH = "/root/reference/scripts/main_hunyuan.py"
WAN_PATH = "/root/reference/scripts/main_wan21t2v.py"


def _slice_source(path, first_marker, last_marker):
    """Extract the inclusive line range [first line containing
    first_marker, first line containing last_marker] and dedent it."""
    lines = open(path).read().splitlines()
    start = next(i for i, l in enumerate(lines) if first_marker in l)
    stop = next(i for i, l in enumerate(lines[start:], start)
                if last_marker in l)
    return textwrap.dedent("\n".join(lines[start:stop + 1])) + "\n"


def _ref_hunyuan_decision_block():
    # main_hunyuan.py:114-126 — the single-stream decision + state update
    return _slice_source(
        HUNYUAN_PATH,
        "if self.cnt == 0 or self.cnt == self.num_steps-1:",
        "self.previous_modulated_input = modulated_inp")


def _ref_wan_decision_block():
    # main_wan21t2v.py:105-133 — the CFG even/odd dual-state decision
    return _slice_source(
        WAN_PATH,
        "if self.cnt%2==0:",
        "self.previous_e0_odd = modulated_inp.clone()")


def decay_trace(num_calls, seed, scale=1.0, streams=1):
    """Synthetic modulated-input trace: per-stream smooth decay + noise,
    mimicking a denoising trajectory's timestep embedding."""
    g = np.random.default_rng(seed)
    base = [g.normal(size=(64,)).astype(np.float32) for _ in range(streams)]
    out = []
    for i in range(num_calls):
        s = i % streams
        step = i // streams
        drift = scale * (0.5 ** (step / 6.0)) * 0.08
        base[s] = base[s] + drift * g.normal(size=(64,)).astype(np.float32)
        out.append(base[s].copy())
    return out


def run_reference_hunyuan(trace, thresh, num_steps):
    block = _ref_hunyuan_decision_block()
    self = types.SimpleNamespace(
        cnt=0, num_steps=num_steps, rel_l1_thresh=thresh,
        accumulated_rel_l1_distance=0, previous_modulated_input=None)
    decisions = []
    for x in trace:
        env = {"self": self, "np": np, "torch": torch,
               "modulated_inp": torch.from_numpy(x)}
        exec(block, env)
        decisions.append(bool(env["should_calc"]))
        self.cnt += 1
    return decisions


def run_reference_wan(trace, thresh, num_steps, ret_steps, cutoff_steps,
                      coefficients):
    block = _ref_wan_decision_block()
    self = types.SimpleNamespace(
        cnt=0, ret_steps=ret_steps, cutoff_steps=cutoff_steps,
        teacache_thresh=thresh, coefficients=coefficients,
        accumulated_rel_l1_distance_even=0,
        accumulated_rel_l1_distance_odd=0,
        previous_e0_even=None, previous_e0_odd=None,
        is_even=True)
    decisions = []
    for x in trace:
        env = {"self": self, "np": np, "torch": torch,
               "modulated_inp": torch.from_numpy(x)}
        exec(block, env)
        key = "should_calc_even" if self.is_even else "should_calc_odd"
        decisions.append(bool(env[key]))
        self.cnt += 1
    return decisions


FLUX_PATH = "/root/reference/scripts/main_upflux.py"
COG_PATH = "/root/reference/scripts/main_cogvideox.py"


def run_reference_flux(trace, thresh, num_steps):
    """main_upflux.py:132-145 — single-stream with the flux coefficient
    table hard-coded in the block."""
    block = _slice_source(
        FLUX_PATH,
        "if self.cnt == 0 or self.cnt == self.num_steps-1:",
        "self.previous_modulated_input = modulated_inp")
    self = types.SimpleNamespace(
        cnt=0, num_steps=num_steps, rel_l1_thresh=thresh,
        accumulated_rel_l1_distance=0, previous_modulated_input=None)
    decisions = []
    for x in trace:
        env = {"self": self, "np": np, "torch": torch,
               "modulated_inp": torch.from_numpy(x)}
        exec(block, env)
        decisions.append(bool(env["should_calc"]))
        self.cnt += 1
    return decisions


def run_reference_cog(trace, thresh, num_steps, coefficients):
    """main_cogvideox.py:107-118 — single-stream keyed on the time
    embedding `emb`, coefficients from the driver table."""
    block = _slice_source(
        COG_PATH,
        "if self.cnt == 0 or self.cnt == self.num_steps-1:",
        "self.previous_modulated_input = emb")
    self = types.SimpleNamespace(
        cnt=0, num_steps=num_steps, rel_l1_thresh=thresh,
        coefficients=coefficients,
        accumulated_rel_l1_distance=0, previous_modulated_input=None)
    decisions = []
    for x in trace:
        env = {"self": self, "np": np, "torch": torch,
               "emb": torch.from_numpy(x)}
        exec(block, env)
        decisions.append(bool(env["should_calc"]))
        self.cnt += 1
    return decisions


def run_ours(trace, **kw):
    tc = TeaCache(**kw)
    return [tc.should_compute(jnp.asarray(x)) for x in trace]


@pytest.mark.parametrize("thresh", [0.05, 0.15, 0.4])
def test_hunyuan_schedule_call_for_call(thresh):
    """Single-stream (Hunyuan) schedule matches the reference's decision
    block exec'd as-is, across thresholds spanning skip regimes.  The
    Hunyuan driver hard-codes its coefficient table inside the block
    (main_hunyuan.py:118), so ours must use the same table entry."""
    num_steps = 50
    trace = decay_trace(num_steps, seed=0)
    want = run_reference_hunyuan(trace, thresh, num_steps)
    got = run_ours(trace, thresh=thresh, num_steps=num_steps,
                   coefficients="hunyuan-video")
    assert got == want
    # sanity: the mid thresholds actually exercise both outcomes
    if thresh == 0.15:
        assert any(got) and not all(got)


@pytest.mark.parametrize("use_ret", [False, True])
@pytest.mark.parametrize("thresh", [0.1, 0.2, 0.3])
def test_wan_cfg_dual_schedule_call_for_call(thresh, use_ret):
    """CFG even/odd dual-state (Wan2.1-T2V) schedule matches the
    reference's decision block exec'd as-is, at the published thresholds
    (0.2 --use_ret_steps per Inference.md) and both coefficient sets
    (main_wan21t2v.py:273-286)."""
    steps = 25
    num_calls = steps * 2
    key = "wan2.1-t2v-14b-ret" if use_ret else "wan2.1-t2v-14b"
    coeffs = COEFFICIENTS[key]
    # reference window setup (main_wan21t2v.py:264-272)
    ret = 5 * 2 if use_ret else 2
    cutoff = (num_calls - 2) if use_ret else (num_calls - 4)
    trace = decay_trace(num_calls, seed=1, streams=2)
    want = run_reference_wan(trace, thresh, num_calls, ret, cutoff, coeffs)
    got = run_ours(trace, thresh=thresh, num_steps=num_calls,
                   coefficients=key, ret_steps=ret, cutoff_steps=cutoff,
                   cfg_streams=2)
    assert got == want


def test_schedules_differ_between_streams():
    """The dual-state machinery keeps independent even/odd accumulators:
    feed a trace where only the odd stream drifts and check the reference
    block and ours agree on the asymmetric schedule."""
    num_calls = 30
    g = np.random.default_rng(3)
    still = g.normal(size=(64,)).astype(np.float32)
    trace = []
    odd = still.copy()
    for i in range(num_calls):
        if i % 2:
            odd = odd + 0.15 * g.normal(size=(64,)).astype(np.float32)
            trace.append(odd.copy())
        else:
            trace.append(still.copy())
    coeffs = [1.0, 0.0]  # identity polynomial isolates the state machine
    want = run_reference_wan(trace, 0.12, num_calls, 2, num_calls - 2,
                             coeffs)
    got = run_ours(trace, thresh=0.12, num_steps=num_calls,
                   coefficients=coeffs, ret_steps=2,
                   cutoff_steps=num_calls - 2, cfg_streams=2)
    assert got == want
    evens = got[0::2][1:-1]
    odds = got[1::2][1:-1]
    assert sum(odds) > sum(evens)


def _replay_trace(path):
    import json
    records = json.load(open(path))
    metas = [r["meta"] for r in records if "meta" in r]
    calls = [r for r in records if "call" in r]
    assert metas and calls, path
    # Multi-instance traces (Wan2.2 A14B: one TeaCache per transformer,
    # both constructed before the loop, calls in boundary order): split
    # the call stream where the per-instance call counter restarts and
    # pair segments with metas in construction order.
    segments = []
    for r in calls:
        if r["call"] == 0 or not segments:
            segments.append([])
        segments[-1].append(r)
    assert len(segments) == len(metas), (path, len(segments), len(metas))
    for meta, seg in zip(metas, segments):
        _replay_segment(meta, seg, path)


def _replay_segment(meta, calls, path):
    streams = meta["cfg_streams"]

    # synthesize per-stream positive scalars whose successive relative-L1
    # ratios reproduce the recorded raw signals exactly
    vals = [1.0] * streams
    tensors = []
    for r in calls:
        s = r["stream"]
        if r["raw"] is not None:
            vals[s] = vals[s] * (1.0 + r["raw"])
        tensors.append(np.full((8,), vals[s], np.float32))

    got = [bool(r["compute"]) for r in calls]
    if streams == 1:
        # the hunyuan and flux blocks hard-code their coefficient tables;
        # route by table, falling back to the cog block (which reads
        # self.coefficients) for any other single-stream family
        c = np.asarray(meta["coefficients"])
        if np.allclose(c, COEFFICIENTS["hunyuan-video"]):
            want = run_reference_hunyuan(tensors, meta["thresh"],
                                         meta["num_steps"])
        elif np.allclose(c, COEFFICIENTS["flux-dev"]):
            want = run_reference_flux(tensors, meta["thresh"],
                                      meta["num_steps"])
        else:
            want = run_reference_cog(tensors, meta["thresh"],
                                     meta["num_steps"],
                                     meta["coefficients"])
    else:
        ret = meta["ret_steps"] if meta["ret_steps"] is not None else streams
        cutoff = (meta["cutoff_steps"] if meta["cutoff_steps"] is not None
                  else meta["num_steps"] - streams)
        want = run_reference_wan(tensors, meta["thresh"],
                                 meta["num_steps"], ret, cutoff,
                                 meta["coefficients"])
    assert got == want[:len(got)], path


def test_recorded_traces_replay_through_reference_code():
    """Organic schedule traces captured on the chip (bench_e2e*
    --trace_out, committed under bench_traces/) must replay through the
    reference's own decision blocks call-for-call."""
    import glob
    import os
    traces = sorted(glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "bench_traces", "*.json")))
    if not traces:
        pytest.skip("no recorded traces")
    for t in traces:
        _replay_trace(t)

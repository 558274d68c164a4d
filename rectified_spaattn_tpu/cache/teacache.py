"""TeaCache — step-residual caching across diffusion steps.

The orthogonal second speedup tier: the whole transformer-stack residual
(hidden_out - hidden_in) is cached; a step is SKIPPED (residual re-applied)
when the modulated input changed little since the last computed step, as
measured by an accumulated, polynomial-rescaled relative-L1 signal
(reference: scripts/main_hunyuan.py:110-157; CFG dual-state variant
scripts/main_wan21t2v.py:105-133).

TPU design (SURVEY §7): the rel-L1 signal is computed on device inside the
jitted embed stage; ONE scalar per step crosses to the host, where the
Python sampler loop branches — the skip decision is inherently
data-dependent and deliberately lives outside jit.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Per-checkpoint polynomial rescaling coefficients for the raw rel-L1
# signal (numpy.poly1d convention: highest power first).  The reference
# hard-codes these in each driver (main_hunyuan.py:118,
# main_wan21t2v.py:273-286, main_cogvideox.py:20-25).
COEFFICIENTS: dict[str, list[float]] = {
    "hunyuan-video": [7.33226126e+02, -4.01131952e+02, 6.75869174e+01,
                      -3.14987800e+00, 9.61237896e-02],
    "wan2.1-t2v-1.3b": [2.39676752e+03, -1.31110545e+03, 2.01331979e+02,
                        -8.29855975e+00, 1.37887774e-01],
    "wan2.1-t2v-14b": [-5784.54975374, 5449.50911966, -1811.16591783,
                       256.27178429, -13.02252404],
    "wan2.1-t2v-14b-ret": [-3.03318725e+05, 4.90537029e+04, -2.65530556e+03,
                           5.87365115e+01, -3.15583525e-01],
    "wan2.1-i2v-480p": [-3.02331670e+02, 2.23948934e+02, -5.25463970e+01,
                        5.87348440e+00, -2.01973289e-01],
    "wan2.1-i2v-480p-ret": [2.57151496e+05, -3.54229917e+04, 1.40286849e+03,
                            -1.35890334e+01, 1.32517977e-01],
    "wan2.1-i2v-720p": [-114.36346466, 65.26524496, -18.82220707,
                        4.91518089, -0.23412683],
    "wan2.1-i2v-720p-ret": [8.10705460e+03, 2.13393892e+02, -3.72934672e+01,
                            1.66203073e+00, -4.17769401e-02],
    "cogvideox1.5-5b": [-1.53880483e+03, 8.43202495e+02, -1.34363087e+02,
                        7.97131516e+00, -5.23162339e-02],
    "cogvideox1.5-5b-i2v": [-1.53880483e+03, 8.43202495e+02, -1.34363087e+02,
                            7.97131516e+00, -5.23162339e-02],
    "flux-dev": [4.98651651e+02, -2.83781631e+02, 5.58554382e+01,
                 -3.82021401e+00, 2.64230861e-01],
    "wan2.2-ti2v-5b": [-3.03318725e+05, 4.90537029e+04, -2.65530556e+03,
                       5.87365115e+01, -3.15583525e-01],
    "wan2.2-a14b": [-3.03318725e+05, 4.90537029e+04, -2.65530556e+03,
                    5.87365115e+01, -3.15583525e-01],
    "identity": [1.0, 0.0],
}

# Optional schedule tracing: set to a list and every TeaCache instance
# appends one meta record at construction plus one record per
# should_compute call ({stream, raw, compute, forced}).  Used by the
# bench scripts (--trace_out) to capture ORGANIC skip schedules that are
# then replayed through the reference's own decision code
# (tests/test_teacache_schedule_parity.py::test_recorded_traces_replay).
TRACE: Optional[list] = None


@contextlib.contextmanager
def trace_to(path: Optional[str]):
    """Enable schedule tracing around the body and dump the records to
    ``path`` as JSON (no-op when ``path`` is falsy).  Yields the live
    trace list (None when disabled) so callers can summarise it.  The
    single writer of the TRACE protocol — the bench scripts' --trace_out
    all route through here."""
    global TRACE
    if not path:
        yield None
        return
    assert TRACE is None, "trace_to contexts must not nest (single writer)"
    TRACE = []
    try:
        yield TRACE
    finally:
        trace, TRACE = TRACE, None
        with open(path, "w") as f:
            json.dump(trace, f)


def residual_value(x_out: jax.Array, x_in: jax.Array,
                   store: str = "bf16"):
    """In-jit encode of the stack residual for record_residual_value.

    ``store``:
      * "bf16" — the reference's format (a bf16 transformer's natural
        residual dtype, main_hunyuan.py:152).
      * "int8" — per-token-row absmax int8 + fp32 [.., 1] scales: HALVES
        both the persistent previous_residual and the want_residual
        output buffer (together ~1.4 GB at 115k tokens — the exact OOM
        margin of the full-depth organic Hunyuan TeaCache run,
        RESULTS_r4.md).  Quantization noise is bounded by
        tests/test_teacache.py::test_int8_residual_tolerance.
    """
    r = x_out - x_in
    if store == "int8":
        # abs/max reduce in fp32, but the full-size fp32 convert fuses
        # into the elementwise round chain (no materialised fp32 copy)
        scale = (jnp.max(jnp.abs(r).astype(jnp.float32), axis=-1,
                         keepdims=True) / 127.0)
        q = jnp.round(r.astype(jnp.float32)
                      / jnp.maximum(scale, 1e-30)).astype(jnp.int8)
        return (q, scale)
    if store != "bf16":
        raise ValueError(f"residual store must be bf16|int8, got {store!r}")
    return r.astype(jnp.bfloat16)


@jax.jit
def _dequant_add(hidden: jax.Array, q: jax.Array,
                 scale: jax.Array) -> jax.Array:
    return (hidden.astype(jnp.float32)
            + q.astype(jnp.float32) * scale).astype(hidden.dtype)


def schedule_from_trace(path: str) -> list:
    """Load a recorded TeaCache schedule (trace_to JSON) as the per-call
    compute/skip list for ``TeaCache(forced_schedule=...)`` replay —
    the calibrated organic schedules (bench_traces/*_calibrated_*.json)
    can then be EXECUTED and timed in a full-depth run whose random
    weights would defeat the signal calibration (VERDICT r4 #1b)."""
    with open(path) as f:
        records = json.load(f)
    return [bool(r["compute"]) for r in records if "call" in r]


def rel_l1_signal(modulated: jax.Array, previous: jax.Array) -> jax.Array:
    """Device-side raw signal: mean|Δ| / mean|prev|
    (reference: main_hunyuan.py:120).  Returns a scalar array — read it on
    host once per step."""
    num = jnp.mean(jnp.abs(modulated.astype(jnp.float32)
                           - previous.astype(jnp.float32)))
    den = jnp.mean(jnp.abs(previous.astype(jnp.float32)))
    return num / jnp.maximum(den, 1e-12)


@dataclasses.dataclass
class TeaCacheState:
    """Host-side state for one cached stream (cond or uncond)."""
    accumulated: float = 0.0
    previous_modulated: Optional[jax.Array] = None
    previous_residual: Optional[jax.Array] = None
    previous_residual_ctx: Optional[jax.Array] = None
    skipped_steps: int = 0
    computed_steps: int = 0


@dataclasses.dataclass
class TeaCache:
    """TeaCache controller.

    Args:
      thresh: accumulated-signal threshold (CLI --rel_l1_thresh /
        --teacache_thresh).
      num_steps: total forward CALLS (CFG counts each pass: the Wan
        drivers set num_steps = steps*2, main_wan21t2v.py:264).
      coefficients: polynomial for rescaling, or a model key into
        COEFFICIENTS.
      ret_steps / cutoff_steps: the accumulate window in CALL units —
        calls outside [ret_steps, cutoff_steps) always compute
        (reference: main_wan21t2v.py:107-117; Hunyuan's first/last-step
        forcing, main_hunyuan.py:114, is the default window
        [cfg_streams, num_steps - cfg_streams)).
      cfg_streams: 2 for classifier-free-guidance even/odd dual state
        (Wan, main_wan21t2v.py:105-133), else 1.
      signal_scale: multiplier on the raw rel-L1 signal BEFORE the
        polynomial.  Real checkpoints use 1.0 (the reference has no such
        knob); random-weight benches calibrate it so the timestep-
        embedding signal lands in the polynomial's realistic domain and
        the organic skip rate matches the published regime
        (cache/calibrate.py; VERDICT r3 next-round #3).
      forced_schedule: per-call compute/skip list (schedule_from_trace):
        REPLAY a recorded organic schedule instead of deciding from the
        signal — lets a full-depth run execute exactly a calibrated
        published-regime schedule and be timed, when its own weight
        statistics defeat the signal calibration (VERDICT r4 #1b).
        Calls past the list's end compute.
      offload_residual: keep previous_residual on the HOST between steps
        (one device→host transfer per computed call, one host→device per
        skipped call) — frees its HBM next to the full-depth working set;
        at video scale the transfer is noise against a 44 s computed
        step (VERDICT r4 #1a).
    """
    thresh: float
    num_steps: int
    coefficients: list | str = "identity"
    ret_steps: Optional[int] = None
    cutoff_steps: Optional[int] = None
    cfg_streams: int = 1
    signal_scale: float = 1.0
    forced_schedule: Optional[Sequence[bool]] = None
    offload_residual: bool = False

    def __post_init__(self):
        coeffs = (COEFFICIENTS[self.coefficients]
                  if isinstance(self.coefficients, str) else self.coefficients)
        self._poly = np.poly1d(coeffs)
        self.states = [TeaCacheState() for _ in range(self.cfg_streams)]
        self._call_count = 0
        if TRACE is not None and self.enabled:
            TRACE.append({"meta": {
                "thresh": self.thresh, "num_steps": self.num_steps,
                "coefficients": list(np.asarray(coeffs, dtype=float)),
                "ret_steps": self.ret_steps,
                "cutoff_steps": self.cutoff_steps,
                "cfg_streams": self.cfg_streams,
                "signal_scale": self.signal_scale,
                "replay": self.forced_schedule is not None}})

    @property
    def enabled(self) -> bool:
        return self.thresh > 0 or self.forced_schedule is not None

    def reset(self):
        self.states = [TeaCacheState() for _ in range(self.cfg_streams)]
        self._call_count = 0

    def should_compute(self, modulated: jax.Array) -> bool:
        """Decide whether the transformer stack must run this call.

        ``modulated`` is the device scalar-source tensor (block-0 norm1
        output or timestep projection, model-specific).  Exactly one host
        readback of one scalar happens here.
        """
        cnt = self._call_count
        self._call_count += 1
        st = self.states[cnt % self.cfg_streams]

        if self.forced_schedule is not None:
            # schedule replay: execute the recorded decision verbatim
            # (no signal math — ``modulated`` is ignored, so replay runs
            # don't even store previous_modulated)
            compute = (bool(self.forced_schedule[cnt])
                       if cnt < len(self.forced_schedule) else True)
            if compute:
                st.computed_steps += 1
            else:
                st.skipped_steps += 1
            if TRACE is not None:
                TRACE.append({"call": cnt,
                              "stream": cnt % self.cfg_streams,
                              "raw": None, "compute": compute,
                              "forced": True})
            return compute

        ret = self.ret_steps if self.ret_steps is not None else self.cfg_streams
        cutoff = (self.cutoff_steps if self.cutoff_steps is not None
                  else self.num_steps - self.cfg_streams)
        raw = None
        if (cnt < ret or cnt >= cutoff
                or st.previous_modulated is None):
            compute = True
            st.accumulated = 0.0
        else:
            # the recorded/consumed raw includes signal_scale, so replay
            # through the reference's decision code stays call-for-call
            raw = (float(rel_l1_signal(modulated, st.previous_modulated))
                   * self.signal_scale)
            st.accumulated += float(self._poly(raw))
            # signed comparison, matching the reference
            # (main_hunyuan.py:121): rescale polynomials go negative for
            # some checkpoints, and the reference keeps skipping there
            if st.accumulated < self.thresh:
                compute = False
            else:
                compute = True
                st.accumulated = 0.0
        # kept in the incoming (model) dtype, as the reference does — a
        # downcast here would perturb the rel-L1 signal near threshold
        st.previous_modulated = modulated
        if compute:
            st.computed_steps += 1
        else:
            st.skipped_steps += 1
        if TRACE is not None:
            TRACE.append({"call": cnt, "stream": cnt % self.cfg_streams,
                          "raw": raw, "compute": compute})
        return compute

    def apply_residual(self, hidden, ctx=None):
        stream = (self._call_count - 1) % self.cfg_streams
        st = self.states[stream]
        res = st.previous_residual
        if self.offload_residual:
            res = jax.tree_util.tree_map(jnp.asarray, res)
        if isinstance(res, tuple):          # int8 encode (residual_value)
            hidden = _dequant_add(hidden, *res)
        else:
            hidden = hidden + res
        if ctx is not None:
            if st.previous_residual_ctx is not None:
                ctx = ctx + st.previous_residual_ctx
            return hidden, ctx
        return hidden

    def record_residual(self, hidden_in, hidden_out, ctx_in=None,
                        ctx_out=None):
        self.record_residual_value(
            (hidden_out - hidden_in).astype(jnp.bfloat16),
            (ctx_out - ctx_in).astype(jnp.bfloat16)
            if ctx_in is not None and ctx_out is not None else None)

    def record_residual_value(self, residual, residual_ctx=None):
        """Store an already-computed stack residual (the pipelines compute
        it INSIDE the blocks jit so the pre-blocks activations can be
        donated — at video scale that buffer is ~0.7 GB).  ``residual``
        may be the bf16 array or the int8 (q, scale) encode from
        :func:`residual_value`."""
        stream = (self._call_count - 1) % self.cfg_streams
        st = self.states[stream]
        if self.offload_residual:
            # device_get blocks until the transfer lands, then the device
            # buffers' refs drop here — previous_residual holds no HBM
            residual = jax.device_get(residual)
        st.previous_residual = residual
        if residual_ctx is not None:
            st.previous_residual_ctx = residual_ctx

    def stats(self) -> dict:
        return {
            "skipped": sum(s.skipped_steps for s in self.states),
            "computed": sum(s.computed_steps for s in self.states),
        }

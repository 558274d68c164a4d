"""Wall-clock probes for the denoise loop.

Replaces the reference's module-level globals + cuda.synchronize probes
(utils/variable.py, scripts/main_hunyuan.py:105-108,199-202) with a timer
that forces a device sync via host readback — ``jax.block_until_ready``
alone does not synchronise through remote-device tunnels.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def device_sync(x=None):
    """Force completion of all queued work (readback of one scalar)."""
    if x is None:
        x = jnp.zeros(())
    float(jnp.sum(jnp.asarray(x, dtype=jnp.float32).ravel()[:1]))


@dataclass
class StageTimer:
    """Accumulates wall-clock per named stage; the denoise-loop total is
    what the reference embeds in output filenames."""
    totals: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        device_sync(sync_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 3), "calls": self.counts[k]}
                for k, v in self.totals.items()}


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Optional jax.profiler trace around a region."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield

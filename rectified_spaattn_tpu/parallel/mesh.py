"""Device-mesh construction helpers.

The reference has NO distributed runtime (SURVEY §2.6) — its multi-GPU
story is independent processes over a sharded prompt list.  On TPU we go
further: a named mesh with data-parallel (dp), tensor/head-parallel (tp)
and sequence-parallel (sp) axes, with XLA inserting collectives over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int | None = None,
              sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp, sp) mesh over the available devices.

    Defaults: tp = min(#devices, 8) heads-parallel, rest dp.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = min(n, 8) if dp is None else n // (dp * sp)
    if dp is None:
        dp = n // (tp * sp)
    assert dp * tp * sp == n, (dp, tp, sp, n)
    arr = np.array(devices).reshape(dp, tp, sp)
    return Mesh(arr, axis_names=("dp", "tp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))

"""Measure mask→indices compaction variants on TPU: sort-based (current)
vs cumsum+scatter."""

import time
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


b, h, nq, nb = 1, 24, 900, 904
g = np.random.default_rng(0)
mask = jnp.asarray(g.uniform(size=(b, h, nq, nb)) < 0.3)


@jax.jit
def via_sort(mask):
    col = jnp.arange(nb, dtype=jnp.int32)
    counts = jnp.sum(mask, axis=-1).astype(jnp.int32)
    key = jnp.where(mask, col, col + nb)
    idx = jnp.sort(key, axis=-1).astype(jnp.int32)
    last = jnp.take_along_axis(idx, jnp.maximum(counts - 1, 0)[..., None],
                               axis=-1)
    slot = col[(None,) * 3]
    return jnp.where(slot < counts[..., None], idx, last), counts


@jax.jit
def via_scatter(mask):
    col = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), mask.shape)
    counts = jnp.sum(mask, axis=-1).astype(jnp.int32)
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    target = jnp.where(mask, rank, nb - 1)
    idx = jnp.zeros(mask.shape, jnp.int32)
    idx = jnp.put_along_axis(idx, target, col, axis=-1, inplace=False)
    last = jnp.take_along_axis(idx, jnp.maximum(counts - 1, 0)[..., None],
                               axis=-1)
    slot = jnp.arange(nb, dtype=jnp.int32)[(None,) * 3]
    return jnp.where(slot < counts[..., None], idx, last), counts


def timed(f, n=5):
    out = f(mask)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(mask)
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / n


log(f"sort:    {timed(via_sort) * 1e3:.1f} ms")
log(f"scatter: {timed(via_scatter) * 1e3:.1f} ms")
a, ca = via_sort(mask)
bb, cb = via_scatter(mask)
print("equal:", bool(jnp.all(a == bb)), bool(jnp.all(ca == cb)))

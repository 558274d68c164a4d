"""Staged single-chip compile check of __graft_entry__.entry()."""

import time
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import __graft_entry__ as g


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


log("building flagship...")
fn, args = g.entry()
log("eager call (inner kernels jit individually)...")
out = fn(*args)
print(float(jnp.sum(out.astype(jnp.float32))))
log("eager done; outer jit...")
t0 = time.time()
out = jax.jit(fn)(*args)
print(float(jnp.sum(out.astype(jnp.float32))))
log(f"outer jit done in {time.time()-t0:.0f}s; out {out.shape}")

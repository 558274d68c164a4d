"""One-off A/B: random-inputs-regime sparse path timing against an
alternate repo checkout (diagnosing the r3->r4 random-regime delta seen
in bench.py's detail payload).

Usage: python scripts/ab_randreg.py [--repo /tmp/r3repo] [--amortize]
"""
import argparse
import json
import os
import sys
import time

ap = argparse.ArgumentParser()
ap.add_argument("--repo", default=None,
                help="repo root to import rectified_spaattn_tpu from "
                     "(default: this repo)")
args = ap.parse_args()

root = args.repo or os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.abspath(root))

import jax
import jax.numpy as jnp
import numpy as np

from rectified_spaattn_tpu.attention import rectified_sparse_attention
from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
from rectified_spaattn_tpu.sparse.pipeline import build_sparse_plan
from rectified_spaattn_tpu.curves import cached_curve


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


b, h, d = 1, 24, 128
lt, lh, lw = 32, 45, 80
text_len = 256
sv = lt * lh * lw
s = sv + text_len
l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
neighbors = jnp.asarray(neighbors)
img_blocks = sv // 128
cfg = SparseConfig(top_k_floor=max(1, select_block_num(0.8, img_blocks)),
                   p_remain=0.3, layout="joint", text_len=text_len)

ks = jax.random.split(jax.random.PRNGKey(1), 3)
q, k, v = (jax.block_until_ready(
    jax.random.normal(kk, (1, h, s, d)).astype(jnp.bfloat16)) for kk in ks)
tlen = jnp.full((b,), text_len, jnp.int32)

sparse_fn = jax.jit(lambda q, k, v: rectified_sparse_attention(
    q, k, v, cfg, neighbors, visual_len=sv, text_len_rt=tlen))
plan_fn = jax.jit(lambda q, k, v: build_sparse_plan(
    q[:, :, :sv], k, v, cfg, neighbor_mask=neighbors))


def timed(f, *arrs, n=4):
    out = f(*arrs)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*arrs)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def amortized(f, *arrs, K=6):
    @jax.jit
    def loop(*xs):
        def body(i, sacc):
            xs2 = list(xs)
            x0 = xs2[0]
            xs2[0] = x0.at[(0,) * x0.ndim].add(
                (sacc * 1e-20).astype(x0.dtype))
            out = f(*xs2)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:4]
                           .astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    float(loop(*arrs))
    t0 = time.perf_counter()
    float(loop(*arrs))
    return (time.perf_counter() - t0) / K


plan = plan_fn(q, k, v)
density = float(jnp.mean(plan.counts)) / plan.indices.shape[-1]
log(f"repo={os.path.abspath(root)} density={density:.4f}")
del plan
t1 = timed(sparse_fn, q, k, v, n=2)
log(f"sparse one-shot: {t1 * 1e3:.1f} ms")
ta = amortized(sparse_fn, q, k, v)
log(f"sparse amortised: {ta * 1e3:.1f} ms")
tp = amortized(plan_fn, q, k, v)
log(f"plan amortised: {tp * 1e3:.1f} ms")
print(json.dumps({"repo": os.path.abspath(root),
                  "density": round(density, 4),
                  "oneshot_ms": round(t1 * 1e3, 1),
                  "amortised_ms": round(ta * 1e3, 1),
                  "plan_ms": round(tp * 1e3, 1)}))

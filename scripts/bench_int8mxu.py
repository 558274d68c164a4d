"""Microbenchmark: is int8 x int8 -> int32 dot native on this chip's MXU?

Isolates the MXU primitive the mxu8 kernel mode relies on: a Pallas
kernel looping dots from resident VMEM buffers (no DMA), comparing
bf16 x bf16 -> fp32 against int8 x int8 -> int32 at the sparse kernel's
tile shape ([128, 128] @ [128, 2048]).  If int8 is emulated (converted
up before the systolic array), the mxu8 gather mode cannot win and the
byte-reduction work must go elsewhere.

Usage: python scripts/bench_int8mxu.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, D, N = 128, 128, 2048
REPS = 64


def _loop_kernel(a_ref, b_ref, o_ref, *, out_dtype):
    def body(i, acc):
        s = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype)
        # fold the iteration in so the loop isn't optimised away
        return acc + s.astype(jnp.float32)[:, :128] * (i + 1)

    o_ref[...] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((M, 128), jnp.float32))


def run(dtype, out_dtype, seed):
    key = jax.random.PRNGKey(seed)
    if dtype == jnp.int8:
        a = jax.random.randint(key, (M, D), -127, 127, jnp.int32).astype(jnp.int8)
        b = jax.random.randint(key, (D, N), -127, 127, jnp.int32).astype(jnp.int8)
    else:
        a = jax.random.normal(key, (M, D), jnp.float32).astype(dtype)
        b = jax.random.normal(key, (D, N), jnp.float32).astype(dtype)
    fn = pl.pallas_call(
        functools.partial(_loop_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = fn(a, b)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    iters = 200
    for _ in range(iters):
        out = fn(a, b)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * M * D * N * REPS
    return dt * 1e6, flops / dt / 1e12


def main():
    results = {}
    for name, dtype, odt in (
            ("bf16", jnp.bfloat16, jnp.float32),
            ("int8", jnp.int8, jnp.int32)):
        us, tflops = run(dtype, odt, 0)
        results[name] = {"us_per_call": round(us, 1),
                         "tflops": round(tflops, 1)}
        print(f"{name}: {us:.1f} us/call  {tflops:.1f} T(FL)OP/s",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Compare dense attention baselines at Hunyuan scale: stock pallas flash
vs our gather kernel with full lists and wide q-tiles.

Round-3 sweep: the kernel supports Sq != Skv, so q can be padded to ANY
tile width regardless of sequence divisibility — bm 256 (the old forced
choice at 115456 tokens), 512, and 1024 are measured head-to-head.
"""

import time
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


b, h, d = 1, 24, 128
s = 115456
FLOPS = 4 * b * h * s * s * d        # fwd attention: 2 matmuls
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(rng, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(rng, (b, h, s, d), jnp.bfloat16)

from rectified_spaattn_tpu.kernels import dense_attention
from rectified_spaattn_tpu.attention.modes import _windowed_dense_flash


def timed(f, n=3):
    out = f(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(q, k, v)
        float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


stock = jax.jit(lambda q, k, v: dense_attention(q, k, v, mode="flash"))
t1 = timed(stock)
log(f"stock flash:             {t1*1e3:.0f} ms "
    f"({FLOPS/t1/1e12:.0f} TF/s)")

tlen = jnp.zeros((b,), jnp.int32)
for bm in (256, 512, 1024):
    fn = jax.jit(lambda q, k, v, bm=bm: _windowed_dense_flash(
        q, k, v, visual_len=s, text_start=None, tlen=tlen, block_m=bm))
    try:
        t = timed(fn)
    except Exception as e:  # noqa: BLE001 — VMEM overflow at wide tiles
        log(f"windowed gather bm{bm}:  FAILED ({type(e).__name__})")
        continue
    log(f"windowed gather bm{bm:<4}: {t*1e3:.0f} ms "
        f"({FLOPS/t/1e12:.0f} TF/s)")

"""Prove the sharded attention paths run the COMPILED Pallas kernel on
real TPU hardware (round-2 review weak #8: the multi-device story had
only ever executed the kernel in interpret mode on the virtual CPU mesh).

Only one chip exists in this environment, so the mesh is 1x1x1 — the
point is the lowering path: shard_map -> pallas_call on the TPU backend,
for BOTH the head-parallel wrapper and the joint ring (ppermute degenerates
to identity at sp=1 but the collective + kernel still lower together).
Outputs are asserted equal to the single-device path.

Run: python scripts/check_sharded_tpu.py   (TPU, ~2-4 compiles)
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from rectified_spaattn_tpu.sparse import SparseConfig
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.attention.sharded import (
        head_parallel_rectified_attention)
    from rectified_spaattn_tpu.attention.ring import (
        ring_rectified_sparse_attention)
    from rectified_spaattn_tpu.parallel import make_mesh

    assert jax.devices()[0].platform != "cpu", "run this on the TPU"
    mesh = make_mesh(dp=1, tp=1, sp=1)

    b, h, d = 1, 4, 128
    sv = 16 * 128
    tlen_pad = 128
    cfg = SparseConfig(top_k_floor=4, p_remain=0.3, layout="joint",
                       text_len=tlen_pad)
    g = np.random.default_rng(5)
    mk = lambda s: jnp.asarray(
        g.normal(size=(b, h, s, d)).astype(np.float32), jnp.bfloat16)
    qv, kv_, vv = mk(sv), mk(sv), mk(sv)
    qt, kt, vt = mk(tlen_pad), mk(tlen_pad), mk(tlen_pad)
    nb = sv // 128
    neighbors = jnp.asarray(np.eye(nb, dtype=bool))
    tlen = jnp.asarray([100], jnp.int32)

    q = jnp.concatenate([qv, qt], axis=2)
    k = jnp.concatenate([kv_, kt], axis=2)
    v = jnp.concatenate([vv, vt], axis=2)

    log("single-device compiled path...")
    want = np.asarray(jax.jit(lambda q, k, v: rectified_sparse_attention(
        q, k, v, cfg, neighbors, visual_len=sv, text_len_rt=tlen))(q, k, v))

    log("head-parallel shard_map, compiled kernel...")
    got = np.asarray(jax.jit(
        lambda q, k, v: head_parallel_rectified_attention(
            mesh, q, k, v, cfg, neighbors, visual_len=sv,
            text_len_rt=tlen))(q, k, v))
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32), rtol=3e-2,
        atol=3e-2)
    log("head-parallel OK (max abs diff "
        f"{np.max(np.abs(got.astype(np.float32) - want.astype(np.float32))):.2e})")

    log("joint ring shard_map, compiled kernel...")
    gv, gt = jax.jit(lambda qv, kv_, vv, qt, kt, vt:
                     ring_rectified_sparse_attention(
                         mesh, qv, kv_, vv, cfg, neighbors,
                         q_text=qt, k_text=kt, v_text=vt,
                         text_len_rt=tlen))(qv, kv_, vv, qt, kt, vt)
    got_ring = np.concatenate([np.asarray(gv), np.asarray(gt)], axis=2)
    np.testing.assert_allclose(
        got_ring.astype(np.float32), want.astype(np.float32), rtol=3e-2,
        atol=3e-2)
    log("joint ring OK (max abs diff "
        f"{np.max(np.abs(got_ring.astype(np.float32) - want.astype(np.float32))):.2e})")
    log("sharded paths execute the compiled kernel on TPU: OK")


if __name__ == "__main__":
    main()

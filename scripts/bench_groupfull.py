"""Full rectified path (plan + group_rows compaction + kernel + R/comp
rectification + exact text rows) with grouped-row execution, A/B against
the single-row default at the bench.py operating point (VERDICT r3 #2).

bench_groupedvars.py attributes the KERNEL-level win (G=2 full 381.5 ms
vs single-row 462.1 at density 0.204, logs/r4_groupedvars.log); this
script answers whether the union compaction's extra plan-side work
(sort over NB keys per grouped row) keeps the win at the headline's
full-path granularity — i.e. whether group_rows=2 should be bench.py's
default.

Usage: python scripts/bench_groupfull.py [--groups 1,2] [--chunks 0]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", default="1,2")
    ap.add_argument("--chunks", default="0",
                    help="chunk_blocks per grouped run (0 = config "
                         "default; comma list sweeps)")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
    from rectified_spaattn_tpu.curves import cached_curve
    from bench import smooth_inputs

    b, h, d = 1, 24, 128
    lt, lh, lw = 32, 45, 80          # 720p, 128 frames -> 115200 tokens
    text_len = 256
    sv = lt * lh * lw
    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    neighbors = jnp.asarray(neighbors)
    img_blocks = sv // 128

    q, k, v = smooth_inputs(jax.random.PRNGKey(0), h, sv, text_len, d,
                            jnp.asarray(np.stack(
                                [x / n for x, n in zip(
                                    np.unravel_index(np.asarray(h2l),
                                                     (lt, lh, lw)),
                                    (lt, lh, lw))], -1), jnp.float32))
    tlen = jnp.full((b,), text_len, jnp.int32)

    def amortized(f, *arrs, K=6):
        @jax.jit
        def loop(*xs):
            def body(i, s):
                xs2 = list(xs)
                x0 = xs2[0]
                xs2[0] = x0.at[(0,) * x0.ndim].add(
                    (s * 1e-20).astype(x0.dtype))
                out = f(*xs2)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:4]
                               .astype(jnp.float32))
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        float(loop(*arrs))
        t0 = time.perf_counter()
        float(loop(*arrs))
        return (time.perf_counter() - t0) / K

    results = {}
    ref_out = None
    for g in (int(x) for x in args.groups.split(",")):
        for ch in (int(x) for x in args.chunks.split(",")):
            cfg = SparseConfig(
                top_k_floor=max(1, select_block_num(0.8, img_blocks)),
                p_remain=0.3, layout="joint", text_len=text_len,
                group_rows=g, chunk_blocks=ch)
            fn = jax.jit(lambda q, k, v, cfg=cfg: rectified_sparse_attention(
                q, k, v, cfg, neighbors, visual_len=sv, text_len_rt=tlen))
            out = jax.block_until_ready(fn(q, k, v))
            if ref_out is None:
                ref_out = np.asarray(out[:, :, :128], np.float32)
            else:
                err = float(np.abs(np.asarray(out[:, :, :128], np.float32)
                                   - ref_out).max())
                log(f"g{g} ch{ch}: max abs err vs g1 on first row: {err}")
                results[f"g{g}_ch{ch}_err"] = err
            del out
            t = amortized(fn, q, k, v, K=args.iters)
            key = f"g{g}_ch{ch}"
            results[key] = round(t * 1e3, 1)
            log(f"{key}: {t * 1e3:.1f} ms (amortised full path)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""On-chip full-scale fidelity gate (VERDICT r4 next-round #6).

The per-family sparse-vs-dense A/B bounds run tiny-config interpret-mode
on CPU; this script measures the COMPILED kernel at the real Hunyuan
operating point (115,200 visual + 256 text tokens, 24 heads x 128,
drop 0.8 / p_remain 0.3, smooth inputs — the regime real checkpoints
operate in): rectified sparse output vs our windowed-dense flash on the
SAME inputs, rel-L1 / PSNR / cosine computed ON DEVICE (reading back two
1.4 GB outputs through the tunnel would dominate).

Reference analogue: eval/image/evaluation/eval_image_diff.py:22-69
(SSIM/PSNR/LPIPS/rel-L1 between dense and sparse outputs of the same
seed).

    python scripts/fidelity_gate.py [--frames 128] [--drop 0.8]
"""

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--drop", type=float, default=0.8)
    ap.add_argument("--p_remain", type=float, default=0.3)
    ap.add_argument("--layout", choices=("joint", "visual"),
                    default="joint")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.attention.modes import _windowed_dense_flash
    from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
    from rectified_spaattn_tpu.sparse.pipeline import build_sparse_plan
    from rectified_spaattn_tpu.curves import cached_curve
    from bench import smooth_inputs

    b, h, d = 1, args.heads, 128
    lt, lh, lw = args.frames // 4, 45, 80
    text_len = 256 if args.layout == "joint" else 0
    sv = lt * lh * lw
    s = sv + text_len

    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    neighbors = jnp.asarray(neighbors)
    img_blocks = sv // 128
    cfg = SparseConfig(
        top_k_floor=max(1, select_block_num(args.drop, img_blocks)),
        p_remain=args.p_remain, layout=args.layout, text_len=text_len,
        first_frame_blocks=(img_blocks // lt
                            if args.layout == "visual" else 0))

    lin = np.asarray(h2l)
    tt, hh, ww = np.unravel_index(lin, (lt, lh, lw))
    coords = jnp.asarray(np.stack([tt / lt, hh / lh, ww / lw], -1),
                         jnp.float32)
    q, k, v = smooth_inputs(jax.random.PRNGKey(0), h, sv, text_len, d,
                            coords)
    tlen = jnp.full((b,), text_len, jnp.int32)
    log(f"{s} tokens, layout={args.layout}, drop={args.drop}, "
        f"p_remain={args.p_remain}")

    @jax.jit
    def metrics(q, k, v):
        sp = rectified_sparse_attention(
            q, k, v, cfg, neighbors, visual_len=sv,
            text_len_rt=tlen if text_len else None).astype(jnp.float32)
        dn = _windowed_dense_flash(
            q, k, v, visual_len=sv,
            text_start=sv if text_len else None,
            tlen=tlen).astype(jnp.float32)
        # text-query rows are exact in both paths; score the visual rows
        sp, dn = sp[:, :, :sv], dn[:, :, :sv]
        diff = sp - dn
        rel_l1 = jnp.mean(jnp.abs(diff)) / jnp.mean(jnp.abs(dn))
        mse = jnp.mean(diff * diff)
        rng = jnp.max(dn) - jnp.min(dn)
        psnr = 10.0 * jnp.log10(rng * rng / jnp.maximum(mse, 1e-30))
        cos = (jnp.sum(sp * dn)
               / jnp.maximum(jnp.linalg.norm(sp.ravel())
                             * jnp.linalg.norm(dn.ravel()), 1e-30))
        rmse = jnp.sqrt(mse)
        return rel_l1, psnr, cos, rmse

    plan_fn = jax.jit(lambda q, k, v: build_sparse_plan(
        q[:, :, :sv], k, v, cfg, neighbor_mask=neighbors).counts)
    counts = plan_fn(q, k, v)
    density = float(jnp.mean(counts)) / (s // 128)
    log(f"executed mask density {density:.4f}")

    log("compiling + running the compiled-kernel fidelity pass...")
    rel_l1, psnr, cos, rmse = (float(x) for x in metrics(q, k, v))
    out = {
        "workload": f"hunyuan720p_{args.frames}f"
                    if args.layout == "joint" else f"wan_{args.frames}f",
        "tokens": s, "sa_drop_rate": args.drop,
        "p_remain": args.p_remain, "density": round(density, 4),
        "rel_l1": round(rel_l1, 5), "psnr_db": round(psnr, 2),
        "cosine": round(cos, 6), "rmse": round(rmse, 5),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

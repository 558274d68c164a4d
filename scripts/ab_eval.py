"""Dense-vs-sparse A/B fidelity harness (reference workflow:
eval/image/evaluation/eval_image_diff.py — same seed, two modes, diff
metrics).

Runs the Hunyuan pipeline twice at a scaled config (random weights unless
--ckpt_dir) with identical seeds — once dense, once sparse — and reports
SSIM / PSNR / cosine / rel-L1 / RMSE between the outputs plus the
wall-clock of each denoise loop.

    python scripts/ab_eval.py --height 256 --width 256 --frame 16 \
        --num_steps 10 --sa_drop_rate 0.8 --scale 0.05
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--frame", type=int, default=16)
    ap.add_argument("--num_steps", type=int, default=10)
    ap.add_argument("--sa_drop_rate", type=float, default=0.8)
    ap.add_argument("--p_remain_rates", type=float, default=0.3)
    ap.add_argument("--scale", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--prompt", type=str,
                    default="several hot air balloons flying over a city.")
    ap.add_argument("--smooth_init", action="store_true",
                    help="spatially low-pass initial latents: peaked "
                         "pooled attention (the real-checkpoint regime, "
                         "which random weights otherwise flatter)")
    args = ap.parse_args()

    from rectified_spaattn_tpu.cli.generate import build_hunyuan
    from rectified_spaattn_tpu.eval import evaluate_pair

    class A:  # adapter reusing the CLI builder
        pass
    for k, v in vars(args).items():
        setattr(A, k, v)
    A.mode = "flash"
    A.enable_teacache = False
    A.teacache_thresh = 0.15
    A.ckpt_dir = None
    A.tp = 1

    A.mode = "flash"
    pipe_d, inputs, _ = build_hunyuan(A)
    init = None
    if args.smooth_init:
        from bench_e2e import smooth_latents
        t, hh, ww = pipe_d.grid
        init = smooth_latents(pipe_d.model.cfg, t, hh, ww, seed=args.seed)
    dense = np.asarray(pipe_d(*inputs, seed=args.seed, init_latents=init))
    t_dense = pipe_d.denoise_seconds

    A.mode = "sparse"
    pipe_s, _, _ = build_hunyuan(A)
    pipe_s.params = pipe_d.params
    sparse = np.asarray(pipe_s(*inputs, seed=args.seed, init_latents=init))
    t_sparse = pipe_s.denoise_seconds

    # latents -> pseudo-images for the image metrics (channel-mean frames)
    d_img = dense[0].mean(axis=0)[..., None]
    s_img = sparse[0].mean(axis=0)[..., None]
    lo, hi = d_img.min(), d_img.max()
    d01 = (d_img - lo) / (hi - lo + 1e-8)
    s01 = np.clip((s_img - lo) / (hi - lo + 1e-8), 0, 1)
    metrics = {}
    for t in range(d01.shape[0]):
        m = evaluate_pair(s01[t], d01[t])
        for k, v in m.items():
            metrics.setdefault(k, []).append(v)
    summary = {k: round(float(np.mean(v)), 4) for k, v in metrics.items()}
    summary["dense_seconds"] = round(t_dense, 2)
    summary["sparse_seconds"] = round(t_sparse, 2)
    summary["speedup"] = round(t_dense / max(t_sparse, 1e-9), 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

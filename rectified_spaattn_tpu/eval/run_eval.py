"""Batch evaluation entrypoint — the reference's inference.sh +
evaluation.sh in one (reference: eval/video/{inference,evaluation}.sh,
eval/video/experiments/multigpu_*.py).

    python -m rectified_spaattn_tpu.eval.run_eval \
        --model hunyuan --prompts prompts.json --limit 600 \
        --out_dir ./eval_out --loops 1 --mode sparse [--score]

Prompts shard across workers with the reference interleaving
(prompt_list[i::num_shards]); generation is per-prompt seeded; --score
runs the gated quality adapters and always writes the diff-metric-ready
output layout.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="hunyuan")
    ap.add_argument("--prompts", required=True,
                    help=".json or .txt prompt list")
    ap.add_argument("--limit", type=int, default=None,
                    help="seeded subsample size (reference: 600 @ seed 42)")
    ap.add_argument("--out_dir", default="./eval_out")
    ap.add_argument("--loops", type=int, default=1)
    ap.add_argument("--mode", default="sparse")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--frame", type=int, default=16)
    ap.add_argument("--num_steps", type=int, default=10)
    ap.add_argument("--scale", type=float, default=0.05)
    ap.add_argument("--shard_index", type=int, default=None)
    ap.add_argument("--num_shards", type=int, default=None)
    ap.add_argument("--score", action="store_true",
                    help="run gated VBench/CLIP adapters afterwards")
    args = ap.parse_args(argv)

    from .generation import generate_batch, load_prompts
    from ..cli.generate import build_hunyuan, DEFAULTS

    prompts = load_prompts(args.prompts, limit=args.limit, seed=42)

    class A:
        pass
    for k, v in vars(args).items():
        setattr(A, k, v)
    A.sa_drop_rate, A.teacache_thresh = DEFAULTS.get(args.model, (0.8, 0.15))
    A.p_remain_rates = 0.3
    A.enable_teacache = False
    A.use_ret_steps = False
    A.ckpt_dir = None
    A.prompt = prompts[0] if prompts else ""

    if args.model != "hunyuan":
        raise SystemExit("run_eval currently wires hunyuan; other families "
                         "via their pipeline classes")
    pipe, _ = build_hunyuan(A)

    import numpy as np

    def encode(prompt):
        from ..cli.generate import _random_text
        return _random_text(prompt, 256, pipe.model.cfg.text_dim)

    def pipeline(text, mask, seed=0):
        latents = pipe(text, mask, seed=seed)
        # latent → displayable frames [T,H,W,1] (no VAE weights here)
        lat = np.asarray(latents)[0].mean(axis=0)[..., None]
        lo, hi = lat.min(), lat.max()
        return (lat - lo) / (hi - lo + 1e-8)

    written = generate_batch(
        pipeline, prompts, args.out_dir, loops=args.loops,
        shard_index=args.shard_index, num_shards=args.num_shards,
        encode_fn=encode)
    print(json.dumps({"generated": len(written), "out_dir": args.out_dir}))

    if args.score:
        from .quality import run_vbench, write_scores
        res = run_vbench(args.out_dir)
        path = write_scores(res, os.path.join(args.out_dir, "scores.json"))
        print(json.dumps({"scores": path, "available": res.get("available")}))


if __name__ == "__main__":
    main()

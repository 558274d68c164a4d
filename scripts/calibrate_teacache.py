"""Calibrate random-weight TeaCache signal scales to the reference's
published call-skip regimes (VERDICT r3 next-round #3).

For the timestep-signal families (Wan2.1 T2V/I2V, Wan2.2 TI2V,
CogVideoX) the TeaCache signal is the timestep-embedding trajectory —
latent-independent, so the organic schedule at tiny spatial shapes on
CPU IS the schedule at video scale.  Procedure per family:

  1. probe: one organic CLI run at signal_scale=1 with --trace_out,
  2. solve the scale whose simulated schedule hits the published rate
     (cache/calibrate.py::solve_signal_scale — exact, since raws do not
     depend on decisions),
  3. re-run organically at the solved scale and write the calibrated
     trace to bench_traces/ (replayed through the reference's exec'd
     decision code by test_teacache_schedule_parity).

Published call-skip regimes (README family table / reference drivers):
Wan2.1-T2V ~65% (thresh 0.2 --use_ret_steps), Wan2.1-I2V ~81%
(thresh 0.3), CogVideoX ~57% (thresh 0.2), Wan2.2-TI2V ~32%
(thresh 0.1).

    python scripts/calibrate_teacache.py [--out bench_traces]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from rectified_spaattn_tpu.cache.calibrate import (   # noqa: E402
    solve_signal_scale, skip_rate, trace_raws, realistic_raw_window)

FAMILIES = [
    # (name, cli model, extra argv, target call-skip rate)
    ("wan21-t2v", "wan21-t2v",
     ["--teacache_thresh", "0.2", "--use_ret_steps"], 0.65),
    ("wan21-i2v", "wan21-i2v", ["--teacache_thresh", "0.3"], 0.81),
    ("cogvideox-t2v", "cogvideox-t2v", ["--teacache_thresh", "0.2"], 0.57),
    ("wan22-ti2v", "wan22-ti2v", ["--teacache_thresh", "0.1"], 0.32),
]

BASE = ["--height", "128", "--width", "128", "--frame", "9",
        "--num_steps", "50", "--scale", "0.05", "--mode", "sparse",
        "--enable_teacache", "--out_dir", "/tmp/calib_out"]


def run_cli(model, extra, trace_path, scale=1.0):
    from rectified_spaattn_tpu.cli.generate import main
    main(["--model", model, *BASE, *extra,
          "--teacache_signal_scale", str(scale),
          "--trace_out", trace_path])
    return json.load(open(trace_path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "bench_traces"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    summary = {}
    for name, model, extra, target in FAMILIES:
        probe_path = f"/tmp/probe_{name}.json"
        records = run_cli(model, extra, probe_path, scale=1.0)
        meta, raws = trace_raws(records)
        in_window = [r for r in raws if r is not None]
        scale, predicted = solve_signal_scale(meta, raws, target)
        lo, hi = realistic_raw_window(meta["coefficients"], meta["thresh"])
        thresh = meta["thresh"]
        final_path = os.path.join(
            args.out, f"{name}_calibrated_thresh{thresh}.json")
        final = run_cli(model, extra, final_path, scale=scale)
        _, fin_raws = trace_raws(final)
        fmeta = [r["meta"] for r in final if "meta" in r][0]
        decisions = [bool(r["compute"]) for r in final if "call" in r]
        achieved = skip_rate(decisions)
        summary[name] = {
            "target_skip_rate": target,
            "signal_scale": scale,
            "predicted_skip_rate": predicted,
            "achieved_skip_rate": achieved,
            "thresh": thresh,
            "raw_median_unscaled": float(sorted(in_window)[
                len(in_window) // 2]) if in_window else None,
            "realistic_raw_window": [lo, hi],
            "trace": os.path.basename(final_path),
        }
        assert fmeta.get("signal_scale") == scale
        print(f"{name}: scale {scale:.4g}  organic skip "
              f"{achieved:.0%} (target {target:.0%}, predicted "
              f"{predicted:.0%}); unscaled raw median "
              f"{summary[name]['raw_median_unscaled']:.3e}, realistic "
              f"window [{lo:.3e}, {hi:.3e}]", flush=True)

    # summary lives in a subdir: every top-level bench_traces/*.json must
    # be a replayable trace (test_teacache_schedule_parity globs them)
    os.makedirs(os.path.join(args.out, "calibration"), exist_ok=True)
    with open(os.path.join(args.out, "calibration", "summary.json"),
              "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

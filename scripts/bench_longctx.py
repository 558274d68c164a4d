"""Long-context headroom: the full rectified sparse path at token counts
BEYOND the reference's longest exercised context.

The reference's long-context mechanism is single-GPU block sparsity, and
its largest exercised workload is HunyuanVideo 720p x 128 frames =
115,200 visual + 256 text tokens (reference: scripts/main_hunyuan.py:240-249,
SURVEY.md section 5 "Long-context").  This script measures the same
rectified path (plan + gather kernel + rectification + exact text rows)
at 2x that context on ONE v5e chip — 720p x 256 frames — plus, memory
permitting, a 2.5x point, against our own dense gather path at the same
token count.

Timing: amortised in-jit loop (one dispatch+readback through the axon
tunnel costs a flat ~30 ms — see RESULTS_r3.md "Timing methodology");
K=4 iterations with a forced data dependency, one readback.

Usage:  python scripts/bench_longctx.py [--frames 256] [--also 320]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def smooth_inputs(key, h, s_vis, text_len, d, coords, alpha=4.0, sigma=1.0):
    """Spatially-smooth token fields (the real-checkpoint regime) —
    same construction as bench.py::smooth_inputs."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def one(noise_key):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 7), 3)
        nfreq = 16
        w = jax.random.normal(k1, (3, nfreq)) * 3.0
        phase = jax.random.uniform(k2, (nfreq,)) * 2 * np.pi
        proj = coords @ w + phase
        basis = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)
        s = s_vis + text_len

        # Head-at-a-time generation: the one-shot [H,S,D] fp32 field+noise
        # temporaries are ~10 GB at 400k tokens; per-head they are ~0.4 GB
        def hbody(i, out):
            mix = jax.random.normal(jax.random.fold_in(k3, i),
                                    (2 * nfreq, d)) / np.sqrt(2 * nfreq)
            field = jnp.pad(basis @ mix, ((0, text_len), (0, 0)))
            noise = jax.random.normal(jax.random.fold_in(noise_key, i),
                                      (s, d))
            row = (alpha * field + sigma * noise).astype(jnp.bfloat16)
            return jax.lax.dynamic_update_slice_in_dim(out, row[None], i,
                                                       axis=0)

        out = jax.lax.fori_loop(
            0, h, hbody, jnp.zeros((h, s, d), jnp.bfloat16))
        return out[None]

    ks = jax.random.split(key, 3)
    return tuple(jax.block_until_ready(one(k)) for k in ks)


def amortized(f, *arrs, K=4):
    """K calls inside one jit with a forced data dependency via a
    perturbation of arrs[0].  arrs[0] is CARRIED through the loop so the
    perturbation updates it in place — the r3 version rebuilt a full
    copy of arrs[0] per call, which at 400k+ tokens is a ~2.5 GB buffer
    the memory budget can no longer spare."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0, *rest):
        def body(i, carry):
            s, x = carry
            x = x.at[(0,) * x.ndim].add((s * 1e-20).astype(x.dtype))
            out = f(x, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:4]
                            .astype(jnp.float32)), x)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x0))
        return s

    float(loop(*arrs))
    t0 = time.perf_counter()
    float(loop(*arrs))
    return (time.perf_counter() - t0) / K


def run_point(frames, heads=24, d=128, text_len=256, drop=0.8,
              p_remain=0.3, plan_chunk=0, kv_tile=0, skip_dense=False,
              packed=False, dense_only=False, k_iters=4, group_rows=1):
    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.attention.modes import _windowed_dense_flash
    from rectified_spaattn_tpu.curves import cached_curve
    from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
    from rectified_spaattn_tpu.sparse.pipeline import build_sparse_plan

    lt, lh, lw = frames // 4, 45, 80          # 720p latent grid
    sv = lt * lh * lw
    s = sv + text_len
    log(f"--- {frames} frames -> {sv} visual + {text_len} text tokens "
        f"({s} total) ---")

    t0 = time.perf_counter()
    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    log(f"curve ready ({time.perf_counter() - t0:.1f}s incl. cache)")
    neighbors = jnp.asarray(neighbors)
    cfg = SparseConfig(
        top_k_floor=max(1, select_block_num(drop, sv // 128)),
        p_remain=p_remain, layout="joint", text_len=text_len,
        plan_row_chunk=plan_chunk, plan_kv_tile=kv_tile,
        group_rows=group_rows)

    lin = np.asarray(h2l)
    tt, hh, ww = np.unravel_index(lin, (lt, lh, lw))
    coords = jnp.asarray(np.stack([tt / lt, hh / lh, ww / lw], -1),
                         jnp.float32)
    q, k, v = smooth_inputs(jax.random.PRNGKey(0), heads, sv, text_len, d,
                            coords)
    tlen = jnp.full((1,), text_len, jnp.int32)
    if dense_only:
        if packed:
            # producer-packed KV for the dense denominator too: the
            # kernel-side packed copy (~4.3 GB at 346k tokens) was
            # exactly the 176 MB-over OOM margin (logs/r4_longctx_dense)
            kv = jax.block_until_ready(jnp.concatenate([k, v], axis=-1))
            del k, v
            dense_fn = jax.jit(lambda q, kv: _windowed_dense_flash(
                q, kv[..., :d], kv[..., d:], visual_len=sv, text_start=sv,
                tlen=tlen, kv_packed=kv))
            log("packed KV on device (dense)")
            t_dense = amortized(dense_fn, q, kv, K=k_iters)
        else:
            dense_fn = jax.jit(lambda q, k, v: _windowed_dense_flash(
                q, k, v, visual_len=sv, text_start=sv, tlen=tlen))
            t_dense = amortized(dense_fn, q, k, v, K=k_iters)
        log(f"dense ours (amortised): {t_dense * 1e3:.1f} ms")
        return dict(frames=frames, tokens=s,
                    dense_ms=round(t_dense * 1e3, 1))
    if packed:
        # producer-packed KV + producer-split q (attention/rectified.py
        # kv_packed/q_text): kills the kernel's own packed copy (~5 GB at
        # 400k tokens) and the interior-axis q_vis slice copy; the plan
        # reads its column stats from the packed array too (kv_packed
        # threads through build_sparse_plan), so the unpacked k/v slices
        # below are dead code under jit.
        kv = jax.block_until_ready(jnp.concatenate([k, v], axis=-1))
        del k, v
        q_vis = jax.block_until_ready(q[:, :, :sv])
        q_text = jax.block_until_ready(q[:, :, sv:])
        del q
        log("packed KV + split q on device")
        sparse_args = (q_vis, q_text, kv)
        sparse_fn = jax.jit(
            lambda q_vis, q_text, kv: rectified_sparse_attention(
                q_vis, kv[..., :d], kv[..., d:], cfg, neighbors,
                visual_len=sv, text_len_rt=tlen, kv_packed=kv,
                q_text=q_text))
        count_fn = jax.jit(lambda q_vis, q_text, kv: build_sparse_plan(
            q_vis, None, None, cfg,
            neighbor_mask=neighbors, kv_packed=kv).counts)
    else:
        sparse_args = (q, k, v)
        sparse_fn = jax.jit(lambda q, k, v: rectified_sparse_attention(
            q, k, v, cfg, neighbors, visual_len=sv, text_len_rt=tlen))
        count_fn = jax.jit(lambda q, k, v: build_sparse_plan(
            q[:, :, :sv], k, v, cfg, neighbor_mask=neighbors).counts)
        dense_fn = jax.jit(lambda q, k, v: _windowed_dense_flash(
            q, k, v, visual_len=sv, text_start=sv, tlen=tlen))
    # density probe: counts only (block_mask/indices are DCE'd), so the
    # probe itself doesn't hold the [B,H,NQ,NB] int32 buffer
    counts = count_fn(*sparse_args)
    density = float(jnp.mean(counts)) / (sv // 128 + text_len // 128)
    log(f"plan built, mask density {density:.4f}")
    del counts

    t_sparse = amortized(sparse_fn, *sparse_args, K=k_iters)
    log(f"sparse (amortised): {t_sparse * 1e3:.1f} ms")
    if skip_dense or packed:
        return dict(frames=frames, tokens=s, density=round(density, 4),
                    sparse_ms=round(t_sparse * 1e3, 1))
    t_dense = amortized(dense_fn, q, k, v, K=k_iters)
    log(f"dense ours (amortised): {t_dense * 1e3:.1f} ms "
        f"-> speedup {t_dense / t_sparse:.2f}x")
    return dict(frames=frames, tokens=s, density=round(density, 4),
                sparse_ms=round(t_sparse * 1e3, 1),
                dense_ms=round(t_dense * 1e3, 1),
                speedup=round(t_dense / t_sparse, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--also", type=int, default=0,
                    help="optional second (larger) frame count")
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--plan_chunk", type=int, default=0,
                    help="row-chunked plan build (SparseConfig."
                         "plan_row_chunk) — bounds the fp32 plan temps; "
                         "required past ~320 frames on one 16 GB chip")
    ap.add_argument("--kv_tile", type=int, default=0,
                    help="key-block tile for the plan's column stats "
                         "(SparseConfig.plan_kv_tile) — bounds the fp32 "
                         "K/V-side plan temps at 345k+ tokens")
    ap.add_argument("--skip_dense", action="store_true",
                    help="sparse only (the dense gather path needs more "
                         "HBM than the sparse path at the max context)")
    ap.add_argument("--dense_only", action="store_true",
                    help="dense only — pairs with a separate --packed "
                         "sparse run at token counts where both paths "
                         "don't co-reside")
    ap.add_argument("--k_iters", type=int, default=4,
                    help="amortised in-jit iterations; use 2 for the "
                         "400k+ dense points so one dispatch stays under "
                         "the ~60 s tunnel watchdog (RESULTS_r4)")
    ap.add_argument("--packed", action="store_true",
                    help="producer-packed KV + split q (sparse only) — "
                         "the memory-lean mode for the max-context points")
    ap.add_argument("--group_rows", type=int, default=1,
                    help="grouped-row kernel execution — composes with "
                         "--packed since round 5 (the plan share grows "
                         "with NB, so the union build amortizes at long "
                         "context)")
    args = ap.parse_args()

    kw = dict(heads=args.heads, plan_chunk=args.plan_chunk,
              kv_tile=args.kv_tile, skip_dense=args.skip_dense,
              packed=args.packed, dense_only=args.dense_only,
              k_iters=args.k_iters, group_rows=args.group_rows)
    results = [run_point(args.frames, **kw)]
    if args.also:
        results.append(run_point(args.also, **kw))
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()

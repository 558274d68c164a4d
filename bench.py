"""Headline benchmark: rectified block-sparse attention on a
HunyuanVideo-720p-class attention workload, on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured quantity is the full sparse path (Gilbert-ordered mask build
+ IPAR/GAPR/top-p selection + Pallas gather kernel + rectification + dense
text rows) at the reference's default HunyuanVideo operating point
(sa_drop_rate 0.8, p_remain 0.3, 115200 visual + 256 text tokens,
24 heads x 128 dim, bf16).

HEADLINE KEY (re-keyed in round 3 per the round-2 review): the value is
the sparse speedup versus OUR OWN dense attention — the windowed-gather
flash path, the fastest dense this framework has (itself ~1.9x faster
than the platform-stock flash kernel, reported in detail) — i.e. the same
measurement level on both sides.  vs_baseline divides by the reference's
published sparse speedup for this exact sa_drop_rate (2.50x,
scripts/Inference.md:15); note the reference's figure is END-TO-END vs
its torch dense, so vs_baseline compares our attention-level gain against
their pipeline-level gain — the two other cross-framework ratios
(vs stock flash, our end-to-end) are in the detail payload.

Input regimes (both reported, advisor r2): the headline uses
spatially-smooth token fields (shared low-frequency field + per-token
noise) — the regime real diffusion checkpoints operate in, where pooled
attention concentrates and the top-k floor dominates (density ~0.20).
detail.random_inputs re-measures on iid-random inputs (density ~0.31,
round-1's regime) so round-over-round numbers stay comparable.

TIMING METHOD (round 3): one dispatch+readback through the axon tunnel
costs ~30 ms regardless of the work dispatched (measured in
scripts/bench_planstages.py: a trivial elementwise stage times the same
~30 ms as the full 22 ms plan build).  The headline ``value`` is
therefore computed from AMORTISED times — the measured path looped K
times inside one jit with a forced data dependency, one readback — which
is the true device time and matches how the path runs inside a pipeline
step (one dispatch per ~40 attention calls, not one per call).  The
round-1/2-comparable one-shot timings (which include the ~30 ms
overhead on BOTH sides of the ratio) stay in the detail payload as
*_ms_oneshot.
"""

import json
import time

import numpy as np

# reference scripts/Inference.md:15 — HunyuanVideo sa_drop 0.8 sparse
# speedup (end-to-end vs its torch dense; see module docstring)
BASELINE_SPEEDUP = 2.50


def smooth_inputs(key, h, s_vis, text_len, d, coords, alpha=4.0, sigma=1.0):
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
        mix = jax.random.normal(k3, (h, 2 * nfreq, d)) / np.sqrt(2 * nfreq)
        field = jnp.einsum("sf,hfd->hsd", basis, mix)
        field = jnp.pad(field, ((0, 0), (0, text_len), (0, 0)))
        noise = jax.random.normal(noise_key, (h, s_vis + text_len, d))
        return (alpha * field + sigma * noise)[None].astype(jnp.bfloat16)

    ks = jax.random.split(key, 3)
    return tuple(jax.block_until_ready(one(k)) for k in ks)


def random_inputs(key, h, s, d):
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(key, 3)
    return tuple(
        jax.block_until_ready(
            jax.random.normal(k, (1, h, s, d)).astype(jnp.bfloat16))
        for k in ks)


def main():
    import jax
    import jax.numpy as jnp
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.kernels import dense_attention
    from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
    from rectified_spaattn_tpu.sparse.pipeline import build_sparse_plan
    from rectified_spaattn_tpu.curves import cached_curve

    b, h, d = 1, 24, 128
    lt, lh, lw = 32, 45, 80          # 720p, 128 frames -> 115200 tokens
    text_len = 256
    sv = lt * lh * lw
    s = sv + text_len

    l2h, h2l, neighbors = cached_curve(lt, lh, lw, block_size=128)
    neighbors = jnp.asarray(neighbors)
    img_blocks = sv // 128
    # group_rows=2: grouped-row union execution (two Gilbert-adjacent query
    # rows per kernel program over the union list) — measured full-path win
    # at this operating point (447.4 vs 456.8 ms, RESULTS_r4.md).  Grouping
    # pays only when adjacent rows overlap (union growth 1.16 on smooth
    # inputs); the iid-random detail regime keeps the r1-r3-comparable
    # single-row config (iid union growth ~1.6 makes G=2 a regression there).
    cfg = SparseConfig(
        top_k_floor=max(1, select_block_num(0.8, img_blocks)),
        p_remain=0.3, layout="joint", text_len=text_len, group_rows=2)
    cfg_g1 = SparseConfig(
        top_k_floor=max(1, select_block_num(0.8, img_blocks)),
        p_remain=0.3, layout="joint", text_len=text_len)

    lin = np.asarray(h2l)
    tt, hh, ww = np.unravel_index(lin, (lt, lh, lw))
    coords = jnp.asarray(np.stack([tt / lt, hh / lh, ww / lw], -1),
                         jnp.float32)
    q, k, v = smooth_inputs(jax.random.PRNGKey(0), h, sv, text_len, d,
                            coords)
    tlen = jnp.full((b,), text_len, jnp.int32)

    from rectified_spaattn_tpu.attention.modes import _windowed_dense_flash

    sparse_fn = jax.jit(lambda q, k, v: rectified_sparse_attention(
        q, k, v, cfg, neighbors, visual_len=sv, text_len_rt=tlen))
    sparse_g1_fn = jax.jit(lambda q, k, v: rectified_sparse_attention(
        q, k, v, cfg_g1, neighbors, visual_len=sv, text_len_rt=tlen))
    dense_fn = jax.jit(lambda q, k, v: dense_attention(q, k, v,
                                                       mode="flash"))
    # our own dense (gather kernel, 512-row q tiles) — the headline's
    # denominator; also ~1.9x faster than the platform-stock flash kernel
    dense_ours_fn = jax.jit(lambda q, k, v: _windowed_dense_flash(
        q, k, v, visual_len=sv, text_start=sv, tlen=tlen))
    plan_fn = jax.jit(lambda q, k, v: build_sparse_plan(
        q[:, :, :sv], k, v, cfg, neighbor_mask=neighbors))

    def timed(f, *arrs, n=4):
        out = f(*arrs)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))   # forced sync readback
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*arrs)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)))
        return (time.perf_counter() - t0) / n

    def amortized(f, *arrs, K=6, reps=1):
        """True device time: K in-jit iterations, one readback.  A scalar
        from iteration i's output perturbs iteration i+1's input (by a
        denormal-scale epsilon) so XLA cannot hoist or CSE the body.

        ``reps`` > 1 repeats the timed loop and returns the list of
        per-iteration times — the headline takes the MEDIAN (round-4
        showed tunnel run-to-run variance of ~15-20 ms on a ~450 ms
        measurement, larger than a round's kernel gain; VERDICT r4 #9)."""
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
        float(loop(*arrs))                      # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(*arrs))
            ts.append((time.perf_counter() - t0) / K)
        return ts if reps > 1 else ts[0]

    def density_of(*arrs):
        plan = plan_fn(*arrs)
        return float(jnp.mean(plan.counts)) / plan.indices.shape[-1]

    t_sparse_1 = timed(sparse_fn, q, k, v)
    t_dense = timed(dense_fn, q, k, v)
    t_dense_ours_1 = timed(dense_ours_fn, q, k, v)
    density = density_of(q, k, v)

    # amortised (true device time — see TIMING METHOD in the docstring),
    # median of 3 timed loops (tunnel variance > one round's kernel gain)
    ts_sparse = amortized(sparse_fn, q, k, v, reps=3)
    ts_dense_ours = amortized(dense_ours_fn, q, k, v, reps=3)
    t_sparse = float(np.median(ts_sparse))
    t_dense_ours = float(np.median(ts_dense_ours))
    spread_ms = {
        "sparse": round((max(ts_sparse) - min(ts_sparse)) * 1e3, 1),
        "dense_ours": round((max(ts_dense_ours) - min(ts_dense_ours)) * 1e3,
                            1)}
    overhead_ms = ((t_sparse_1 - t_sparse) + (t_dense_ours_1 - t_dense_ours)) / 2 * 1e3

    # iid-random regime (round-1 comparability: the r1-r3 single-row
    # config).  The g1 program is cold at this point in the process —
    # warm it twice before timing (a single warm execution of a
    # fresh-compiled program measured ~200 ms slow through the tunnel;
    # standalone A/B pinned the code itself unchanged, logs/r4_abrand_*)
    qr, kr, vr = random_inputs(jax.random.PRNGKey(1), h, s, d)
    float(jnp.sum(sparse_g1_fn(qr, kr, vr)[:, :, :4].astype(jnp.float32)))
    t_sparse_r = timed(sparse_g1_fn, qr, kr, vr, n=2)
    t_dense_ours_r = timed(dense_ours_fn, qr, kr, vr, n=2)
    density_r = density_of(qr, kr, vr)

    speedup = t_dense_ours / t_sparse

    print(json.dumps({
        "metric": "hunyuan720p_attention_speedup_sparse_vs_own_dense",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / BASELINE_SPEEDUP, 3),
        "detail": {
            "sparse_ms": round(t_sparse * 1e3, 1),
            "dense_ours_ms": round(t_dense_ours * 1e3, 1),
            "dense_stock_flash_ms_oneshot": round(t_dense * 1e3, 1),
            "speedup_vs_stock_flash": round(t_dense / t_sparse_1, 3),
            "sparse_ms_oneshot": round(t_sparse_1 * 1e3, 1),
            "dense_ours_ms_oneshot": round(t_dense_ours_1 * 1e3, 1),
            "speedup_oneshot": round(t_dense_ours_1 / t_sparse_1, 3),
            "dispatch_readback_overhead_ms": round(overhead_ms, 1),
            "median_of": 3,
            "spread_ms": spread_ms,
            "mask_density": round(density, 4),
            "random_inputs": {
                "speedup_vs_own_dense": round(t_dense_ours_r / t_sparse_r,
                                              3),
                "sparse_ms": round(t_sparse_r * 1e3, 1),
                "dense_ours_ms": round(t_dense_ours_r * 1e3, 1),
                "mask_density": round(density_r, 4),
            },
            "reference_e2e_sparse_speedup": BASELINE_SPEEDUP,
            "tokens": s, "heads": h, "sa_drop_rate": 0.8,
        },
    }))


if __name__ == "__main__":
    main()

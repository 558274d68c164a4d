"""Headline benchmark: rectified block-sparse attention vs dense flash on a
HunyuanVideo-720p-class attention workload, on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured quantity is the full sparse path (Gilbert-ordered mask build
+ IPAR/GAPR/top-p selection + Pallas gather kernel + rectification + dense
text rows) against the stock dense flash attention, at the reference's
default HunyuanVideo operating point (sa_drop_rate 0.8, p_remain 0.3,
115200 visual + 256 text tokens, 24 heads x 128 dim, bf16).

Inputs are spatially-smooth token fields (a shared low-frequency field +
per-token noise), the regime real diffusion checkpoints operate in: pooled
attention concentrates, so the top-p mass threshold selects few blocks and
the top-k floor (= (1-sa_drop_rate)*NB) dominates counts — density lands
at ~0.20 (vs ~0.31 on iid-random inputs, which understate sparsity).  The
measured density is reported in the detail payload.

vs_baseline compares against the reference's published END-TO-END dense→
sparse speedup on the same workload (3.33x, README.md:68-83 / BASELINE.md)
— a conservative denominator, since end-to-end includes non-attention
work that dilutes the reference's attention-level gain.  (The reference's
own Inference.md:15 quotes 2.50x for this exact sa_drop_rate; the README
demo row is the higher of the two published figures.)
"""

import json
import time

import numpy as np

BASELINE_SPEEDUP = 3.33   # reference Hunyuan 720p dense/sparse wall-clock


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
    cfg = SparseConfig(
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
    dense_fn = jax.jit(lambda q, k, v: dense_attention(q, k, v,
                                                       mode="flash"))
    # our own dense implementation (gather kernel, 512-row q tiles) —
    # measured ~1.9x faster than the stock flash kernel at this scale;
    # reported for transparency, the ratio uses the platform-standard
    # dense flash like the reference used flash-attn 2
    dense_ours_fn = jax.jit(lambda q, k, v: _windowed_dense_flash(
        q, k, v, visual_len=sv, text_start=sv, tlen=tlen))
    plan_fn = jax.jit(lambda q, k, v: build_sparse_plan(
        q[:, :, :sv], k, v, cfg, neighbor_mask=neighbors))

    def timed(f, n=4):
        out = f(q, k, v)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))   # forced sync readback
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(q, k, v)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)))
        return (time.perf_counter() - t0) / n

    t_sparse = timed(sparse_fn)
    t_dense = timed(dense_fn)
    t_dense_ours = timed(dense_ours_fn)
    plan = plan_fn(q, k, v)
    density = float(jnp.mean(plan.counts)) / plan.indices.shape[-1]
    speedup = t_dense / t_sparse

    print(json.dumps({
        "metric": "hunyuan720p_attention_speedup_sparse_vs_dense",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / BASELINE_SPEEDUP, 3),
        "detail": {
            "dense_stock_flash_ms": round(t_dense * 1e3, 1),
            "dense_ours_ms": round(t_dense_ours * 1e3, 1),
            "sparse_ms": round(t_sparse * 1e3, 1),
            "speedup_vs_our_dense": round(t_dense_ours / t_sparse, 3),
            "mask_density": round(density, 4),
            "tokens": s, "heads": h, "sa_drop_rate": 0.8,
        },
    }))


if __name__ == "__main__":
    main()

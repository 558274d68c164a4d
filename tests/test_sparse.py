"""Unit tests for the sparse-mask pipeline vs an independent NumPy oracle
(SURVEY §4 implication (a): IPAR/GAPR math vs NumPy transliteration)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rectified_spaattn_tpu.sparse import (
    SparseConfig, build_sparse_plan, ops)

BM = 16  # small block size for tests (the math is block-size agnostic)


def rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- oracle ----

def np_pool(x, block):
    b, h, s, d = x.shape
    return x.reshape(b, h, s // block, block, d).mean(axis=-2)


def np_gapr(q, k, block):
    """NumPy oracle of the GAPR mask (first-order pooling-error estimate)."""
    qb = q.reshape(*q.shape[:2], -1, block, q.shape[-1])
    kb = k.reshape(*k.shape[:2], -1, block, k.shape[-1])
    qp, kp = qb.mean(-2), kb.mean(-2)
    iq, jk = block, block
    dq = np.abs(qb - qp[..., None, :]).mean(-2)
    dk = np.abs(kb - kp[..., None, :]).mean(-2)
    err = (np.abs(np.einsum("bhqd,bhkd->bhqk", dq, kp)) * iq * jk
           + np.abs(np.einsum("bhqd,bhkd->bhqk", qp, dk)) * iq * jk)
    scores = np.einsum("bhqd,bhkd->bhqk", qp, kp)
    gain = iq * jk * np.abs(scores)
    return ~(gain > err)


def np_topp_onehot(probs, p_remain, floor):
    """Row-loop oracle of top-p selection with a top-k floor."""
    out = np.zeros(probs.shape, dtype=bool)
    counts = np.zeros(probs.shape[:-1], dtype=np.int32)
    flat = probs.reshape(-1, probs.shape[-1])
    oflat = out.reshape(-1, probs.shape[-1])
    cflat = counts.reshape(-1)
    for i, row in enumerate(flat):
        order = np.argsort(-row, kind="stable")
        csum = np.cumsum(row[order])
        n = int((csum <= p_remain).sum()) + 1
        n = max(n, floor)
        cflat[i] = n
        oflat[i, order[:n]] = True
    return out, counts


# ----------------------------------------------------------------- units ----

def test_block_pool_matches_numpy():
    x = rng(1).normal(size=(2, 3, 64, 8)).astype(np.float32)
    got = np.asarray(ops.block_pool(jnp.asarray(x), 16))
    np.testing.assert_allclose(got, np_pool(x, 16), rtol=1e-5, atol=1e-6)


def test_gapr_matches_numpy():
    q = rng(2).normal(size=(1, 2, 64, 8)).astype(np.float32)
    k = rng(3).normal(size=(1, 2, 80, 8)).astype(np.float32)
    qb = jnp.asarray(q).reshape(1, 2, 4, 16, 8)
    kb = jnp.asarray(k).reshape(1, 2, 5, 16, 8)
    qp, kp = jnp.mean(qb, -2), jnp.mean(kb, -2)
    scores = ops.pooled_scores(qp, kp)
    got = np.asarray(ops.estimate_pr_gain(qb, kb, qp, kp, scores))
    np.testing.assert_array_equal(got, np_gapr(q, k, 16))


def test_ipar_matches_formula():
    probs = rng(4).uniform(size=(1, 2, 4, 10)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    nv, bn = 6, 16
    got = np.asarray(ops.ipar_reallocate(jnp.asarray(probs), nv, bn))
    vis, txt = probs[..., :nv], probs[..., nv:].sum(-1, keepdims=True)
    denom = vis.sum(-1, keepdims=True) * bn + txt
    want = np.concatenate([vis * bn / denom, txt / denom], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # text + visual mass still sums to 1 under the token-level measure:
    np.testing.assert_allclose(
        (got[..., :nv].sum(-1) / bn * bn + got[..., nv]),
        (vis * bn / denom).sum(-1) + (txt / denom)[..., 0], rtol=1e-5)


@pytest.mark.parametrize("p_remain,floor", [(0.3, 2), (0.7, 1), (0.0, 3)])
def test_topp_selection_matches_oracle(p_remain, floor):
    probs = rng(5).uniform(size=(2, 3, 6, 12)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    counts, order = ops.topp_topk_counts(jnp.asarray(probs), p_remain, floor)
    onehot = ops.counts_to_onehot(counts, order)
    want_onehot, want_counts = np_topp_onehot(probs, p_remain, floor)
    np.testing.assert_array_equal(np.asarray(counts), want_counts)
    np.testing.assert_array_equal(np.asarray(onehot), want_onehot)


def test_threshold_onehot_matches_rank_selection():
    probs = rng(12).uniform(size=(2, 3, 6, 40)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    counts, order = ops.topp_topk_counts(jnp.asarray(probs), 0.35, 3)
    want = ops.counts_to_onehot(counts, order)
    got = ops.topp_threshold_onehot(jnp.asarray(probs), 0.35, 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mask_to_indices_roundtrip():
    mask = rng(6).uniform(size=(2, 2, 5, 9)) < 0.4
    mask[..., 0, :] = False
    mask[0, 0, 0, 3] = True  # ensure at least one row with exactly one True
    idx, counts = ops.mask_to_indices(jnp.asarray(mask))
    idx, counts = np.asarray(idx), np.asarray(counts)
    for b in range(2):
        for h in range(2):
            for q in range(5):
                true_cols = np.where(mask[b, h, q])[0]
                n = counts[b, h, q]
                assert n == len(true_cols)
                np.testing.assert_array_equal(idx[b, h, q, :n], true_cols)
                if n:  # tail repeats the last valid index (DMA-elision trick)
                    assert (idx[b, h, q, n:] == true_cols[-1]).all()


# ------------------------------------------------------------- end-to-end ----

def make_joint_inputs(seed=7, b=1, h=2, nq=6, text_blocks=1, d=8):
    g = rng(seed)
    sv = nq * BM
    st = text_blocks * BM
    q = g.normal(size=(b, h, sv, d)).astype(np.float32)
    k = g.normal(size=(b, h, sv + st, d)).astype(np.float32)
    v = g.normal(size=(b, h, sv + st, d)).astype(np.float32)
    return q, k, v, sv, st


def np_joint_plan(q, k, v, cfg, neighbors, text_valid):
    """Full NumPy oracle of the joint-layout plan (reference semantics:
    rectified_hunyuan_attn.py:171-280 + 347-357, with static-shape text
    validity masking)."""
    b, h, sv, d = q.shape
    nq = sv // cfg.block_m
    st = cfg.text_len
    sm = d ** -0.5
    qp = np_pool(q, cfg.block_m)
    kvis = k[:, :, :nq * cfg.block_n]
    kp = np_pool(kvis, cfg.block_n)
    ktext = k[:, :, nq * cfg.block_n: nq * cfg.block_n + st]
    cols = np.concatenate([kp, ktext], axis=2)
    scores_u = np.einsum("bhqd,bhkd->bhqk", qp, cols)
    scores = scores_u * sm
    if text_valid is not None:
        inv = ~text_valid
        scores[..., nq:][np.broadcast_to(inv[:, None, None, :],
                                         scores[..., nq:].shape)] = -1e30
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs_tok = e / e.sum(-1, keepdims=True)
    nogapr = np_gapr(q, kvis, cfg.block_m)
    vis = probs_tok[..., :nq]
    txt = probs_tok[..., nq:].sum(-1, keepdims=True)
    denom = vis.sum(-1, keepdims=True) * cfg.block_n + txt
    probs = np.concatenate([vis * cfg.block_n / denom, txt / denom], -1)
    onehot, _ = np_topp_onehot(probs, cfg.p_remain, cfg.top_k_floor)
    vis_sel = onehot[..., :nq] | neighbors[None, None, :nq, :nq]
    mask = np.concatenate(
        [vis_sel, np.ones((b, h, nq, st // cfg.block_n), bool)], -1)
    partial = np.concatenate(
        [vis_sel | nogapr, np.ones((b, h, nq, 1), bool)], -1)
    vp = np_pool(v, cfg.block_n)[:, :, :nq + 1]
    r = np.where(partial, probs, 0).sum(-1)
    comp = np.einsum("bhqk,bhkd->bhqd", np.where(partial, 0, probs), vp)
    return mask, r, comp


def test_joint_plan_matches_oracle():
    q, k, v, sv, st = make_joint_inputs()
    nq = sv // BM
    cfg = SparseConfig(top_k_floor=2, p_remain=0.4, block_m=BM, block_n=BM,
                       layout="joint", text_len=st)
    g = rng(8)
    neighbors = np.eye(nq, dtype=bool) | (g.uniform(size=(nq, nq)) < 0.1)
    neighbors |= neighbors.T
    text_valid = np.ones((1, st), bool)
    text_valid[:, st - 5:] = False
    kz = k.copy()
    kz[:, :, sv + st - 5:] = 0.0  # caller zeroes invalid K/V
    vz = v.copy()
    vz[:, :, sv + st - 5:] = 0.0

    plan = build_sparse_plan(
        jnp.asarray(q), jnp.asarray(kz), jnp.asarray(vz), cfg,
        neighbor_mask=jnp.asarray(neighbors),
        text_valid=jnp.asarray(text_valid))
    mask, r, comp = np_joint_plan(q, kz, vz, cfg, neighbors, text_valid)
    np.testing.assert_array_equal(np.asarray(plan.block_mask), mask)
    np.testing.assert_allclose(np.asarray(plan.r_factor), r, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(plan.comp), comp, rtol=1e-3,
                               atol=5e-4)
    # indices/counts consistent with the mask
    assert (np.asarray(plan.counts) == mask.sum(-1)).all()


def np_visual_plan(q, k, v, cfg, neighbors):
    b, h, sv, d = q.shape
    nq = sv // cfg.block_m
    sm = d ** -0.5
    qp, kp = np_pool(q, cfg.block_m), np_pool(k, cfg.block_n)
    scores_u = np.einsum("bhqd,bhkd->bhqk", qp, kp)
    e = np.exp(scores_u * sm - (scores_u * sm).max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    nogapr = np_gapr(q, k, cfg.block_m)
    onehot, _ = np_topp_onehot(probs, cfg.p_remain, cfg.top_k_floor)
    mask = onehot | neighbors[None, None, :nq, :nq]
    if cfg.first_frame_blocks:
        f = cfg.first_frame_blocks
        mask[..., :f, :f] = True
    partial = mask | nogapr
    vp = np_pool(v, cfg.block_n)
    r = np.where(partial, probs, 0).sum(-1)
    comp = np.einsum("bhqk,bhkd->bhqd", np.where(partial, 0, probs), vp)
    return mask, r, comp


def test_visual_plan_matches_oracle():
    g = rng(9)
    b, h, nq, d = 1, 2, 8, 8
    sv = nq * BM
    q = g.normal(size=(b, h, sv, d)).astype(np.float32)
    k = g.normal(size=(b, h, sv, d)).astype(np.float32)
    v = g.normal(size=(b, h, sv, d)).astype(np.float32)
    cfg = SparseConfig(top_k_floor=2, p_remain=0.35, block_m=BM, block_n=BM,
                       layout="visual", first_frame_blocks=2)
    neighbors = np.eye(nq, dtype=bool)
    plan = build_sparse_plan(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             cfg, neighbor_mask=jnp.asarray(neighbors))
    mask, r, comp = np_visual_plan(q, k, v, cfg, neighbors)
    np.testing.assert_array_equal(np.asarray(plan.block_mask), mask)
    np.testing.assert_allclose(np.asarray(plan.r_factor), r, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(plan.comp), comp, rtol=1e-3,
                               atol=5e-4)


def test_plan_jits_without_host_sync():
    import jax
    q, k, v, sv, st = make_joint_inputs(seed=11)
    cfg = SparseConfig(top_k_floor=1, p_remain=0.3, block_m=BM, block_n=BM,
                       layout="joint", text_len=st)
    f = jax.jit(lambda q, k, v: build_sparse_plan(q, k, v, cfg))
    plan = f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert plan.block_mask.shape[-1] == (sv + st) // BM


def test_bisect_topp_matches_sort_topp():
    """Bisection selection must pick the same block set as the sort
    implementation (up to sub-float-resolution near-ties) on both peaked
    and flat distributions."""
    import jax.numpy as jnp
    from rectified_spaattn_tpu.sparse.ops import (
        topp_threshold_onehot, topp_threshold_onehot_bisect)
    g = np.random.default_rng(3)
    for temp, floor in ((0.3, 4), (2.0, 4), (0.5, 1), (0.1, 12)):
        logits = g.standard_normal((2, 3, 24, 40)).astype(np.float32) / temp
        probs = jnp.asarray(
            np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
        a = np.asarray(topp_threshold_onehot(probs, 0.3, floor))
        b = np.asarray(topp_threshold_onehot_bisect(probs, 0.3, floor))
        agree = (a == b).mean()
        assert agree > 0.999, (temp, floor, agree)
        # invariants hold exactly: floor respected, top-p mass reached
        cnt = b.sum(-1)
        assert (cnt >= floor).all()
        mass = np.where(np.asarray(b), np.asarray(probs), 0).sum(-1)
        assert (mass > 0.3).all()


def test_bisect_topp_full_density():
    import jax.numpy as jnp
    from rectified_spaattn_tpu.sparse.ops import topp_threshold_onehot_bisect
    probs = jnp.asarray(np.full((1, 1, 4, 8), 1 / 8, np.float32))
    out = np.asarray(topp_threshold_onehot_bisect(probs, 1.0, 1))
    assert out.all()


def test_group_rows_clean_first_ordering():
    """group_rows with clean_blocks partitions union slots
    [all-member ∧ block < clean_blocks | rest], each part ascending, and
    reports the clean-prefix length; rowbits stay aligned to the
    reordered indices."""
    import numpy as np
    from rectified_spaattn_tpu.sparse.ops import group_rows
    g = np.random.default_rng(7)
    mask = g.uniform(size=(1, 2, 8, 23)) < 0.45
    mask[..., 0] = True
    cb = 17
    idx, counts, rowbits, clean = map(
        np.asarray, group_rows(jnp.asarray(mask), 4, clean_blocks=cb))
    for h in range(2):
        for p in range(2):
            rows = mask[0, h, 4 * p: 4 * p + 4]
            union = np.where(rows.any(0))[0]
            allm = rows.all(0)
            want_clean = sorted(c for c in union if allm[c] and c < cb)
            want_tail = sorted(c for c in union if not (allm[c] and c < cb))
            n, ncl = counts[0, h, p], clean[0, h, p]
            assert ncl == len(want_clean)
            np.testing.assert_array_equal(idx[0, h, p, :ncl], want_clean)
            np.testing.assert_array_equal(idx[0, h, p, ncl:n], want_tail)
            for s_ in range(n):
                col = idx[0, h, p, s_]
                for r in range(4):
                    assert bool(rowbits[0, h, p, s_] & (1 << r)) == bool(
                        rows[r, col])


@pytest.mark.parametrize("chunk", [2, 4, 5])
def test_chunked_plan_equals_oneshot_joint(chunk):
    """plan_row_chunk tiles the build over query-block rows; results must
    be bit-identical to the one-shot build (incl. the padded last tile
    when chunk does not divide NQ)."""
    import dataclasses
    import jax
    q, k, v, sv, st = make_joint_inputs(seed=13, nq=7, text_blocks=1)
    nq = sv // BM
    neighbors = np.eye(nq, dtype=bool)
    base = SparseConfig(top_k_floor=2, p_remain=0.3, block_m=BM,
                        block_n=BM, layout="joint", text_len=st)
    tv = np.ones((1, st), bool)
    tv[:, st - 40:] = False
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = jax.jit(lambda *a: build_sparse_plan(
        *a, base, neighbor_mask=jnp.asarray(neighbors),
        text_valid=jnp.asarray(tv)))(*args)
    cfg = dataclasses.replace(base, plan_row_chunk=chunk)
    got = jax.jit(lambda *a: build_sparse_plan(
        *a, cfg, neighbor_mask=jnp.asarray(neighbors),
        text_valid=jnp.asarray(tv)))(*args)
    for name, w, g in zip(want._fields, want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), err_msg=name)


def test_chunked_plan_equals_oneshot_visual_ff():
    """Visual layout with first-frame force-includes: the tile's global
    row indices must feed ff_force_mask (a local arange would force the
    wrong rows)."""
    import dataclasses
    import jax
    g = rng(17)
    b, h, nq, d = 1, 2, 6, 8
    sv = nq * BM
    q = g.normal(size=(b, h, sv, d)).astype(np.float32)
    k = g.normal(size=(b, h, sv, d)).astype(np.float32)
    v = g.normal(size=(b, h, sv, d)).astype(np.float32)
    base = SparseConfig(top_k_floor=2, p_remain=0.35, block_m=BM,
                        block_n=BM, layout="visual", first_frame_blocks=2)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = jax.jit(lambda *a: build_sparse_plan(*a, base))(*args)
    cfg = dataclasses.replace(base, plan_row_chunk=2)
    got = jax.jit(lambda *a: build_sparse_plan(*a, cfg))(*args)
    for name, w, g2 in zip(want._fields, want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g2),
                                      err_msg=name)


@pytest.mark.parametrize("tile,layout", [(2, "joint"), (3, "joint"),
                                         (2, "visual"), (5, "visual")])
def test_kv_tiled_plan_equals_oneshot(tile, layout):
    """plan_kv_tile computes the column stats (pooled K/V, GAPR dk) in
    key-block tiles with a clamped overlapping tail; results must be
    bit-identical to the one-shot build."""
    import dataclasses
    import jax
    if layout == "joint":
        q, k, v, sv, st = make_joint_inputs(seed=23, nq=7, text_blocks=2)
        base = SparseConfig(top_k_floor=2, p_remain=0.3, block_m=BM,
                            block_n=BM, layout="joint", text_len=st)
    else:
        g = rng(29)
        sv = 7 * BM
        q = g.normal(size=(1, 2, sv, 8)).astype(np.float32)
        k = g.normal(size=(1, 2, sv, 8)).astype(np.float32)
        v = g.normal(size=(1, 2, sv, 8)).astype(np.float32)
        base = SparseConfig(top_k_floor=2, p_remain=0.3, block_m=BM,
                            block_n=BM, layout="visual")
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = jax.jit(lambda *a: build_sparse_plan(*a, base))(*args)
    cfg = dataclasses.replace(base, plan_kv_tile=tile)
    got = jax.jit(lambda *a: build_sparse_plan(*a, cfg))(*args)
    for name, w, g2 in zip(want._fields, want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g2),
                                      err_msg=name)


@pytest.mark.parametrize("kv_tile", [0, 3])
def test_packed_kv_plan_equals_unpacked(kv_tile):
    """The plan built from a producer-packed [K|V] array with a validity
    mask must equal the plan built from pre-zeroed unpacked k/v — the
    long-context path never materialises full-length K/V slices."""
    import dataclasses
    import jax
    q, k, v, sv, st = make_joint_inputs(seed=31, nq=6, text_blocks=2)
    d = q.shape[-1]
    # validity: all visual + a 24-token text window
    valid = np.zeros((1, sv + st), bool)
    valid[:, :sv] = True
    valid[:, sv:sv + 24] = True
    tv = valid[:, sv:]
    kz = np.where(valid[:, None, :, None], k, 0)
    vz = np.where(valid[:, None, :, None], v, 0)
    cfg = SparseConfig(top_k_floor=2, p_remain=0.3, block_m=BM,
                       block_n=BM, layout="joint", text_len=st,
                       plan_kv_tile=kv_tile)
    want = jax.jit(lambda *a: build_sparse_plan(
        *a, cfg, text_valid=jnp.asarray(tv)))(
        jnp.asarray(q), jnp.asarray(kz), jnp.asarray(vz))
    kv = jnp.concatenate([jnp.asarray(k), jnp.asarray(v)], axis=-1)
    got = jax.jit(lambda qq, pkv: build_sparse_plan(
        qq, None, None, cfg, text_valid=jnp.asarray(tv),
        kv_packed=pkv, kv_valid=jnp.asarray(valid)))(jnp.asarray(q), kv)
    for name, w, g2 in zip(want._fields, want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g2),
                                      err_msg=name)

"""Adversarial mask-parity fixture (VERDICT round-1 item 7).

A literal NumPy transliteration of the reference's composed plan builder —
``_build_block_index_with_importance_optimized`` + ``estimate_pr_gain``
(reference: rectified_spaattn/rectified_hunyuan_attn.py:171-280,
gapr_mask.py:4-42) — asserted BIT-IDENTICAL against our
``build_sparse_plan`` block masks on peaked, spatially-smooth fixtures
(the realistic regime, where pooled attention concentrates and the top-p
cut lands on a steep probability cliff).

Tie semantics at the cut differ by design: the reference scatters the
first-N positions of a descending sort (dropping all but an arbitrary one
of exactly-tied probabilities at the boundary), while our threshold
selection keeps EVERY block tied with the N-th value — a superset whose
extras carry identical probability, so rectification R/comp see the same
mass.  ``test_tie_semantics_superset`` pins that bound explicitly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rectified_spaattn_tpu.sparse import SparseConfig
from rectified_spaattn_tpu.sparse.pipeline import build_sparse_plan

BM = BN = 128


def ref_estimate_pr_gain(Q_blocks, K_blocks, q_pools, k_pools, scores):
    """gapr_mask.py:4-42 transliterated to NumPy (fp32)."""
    IQ = Q_blocks.shape[-2]
    JK = K_blocks.shape[-2]
    delta_q = np.abs(Q_blocks - q_pools[..., None, :]).mean(-2)
    delta_k = np.abs(K_blocks - k_pools[..., None, :]).mean(-2)
    err_q = np.abs(np.einsum("bhqd,bhkd->bhqk", delta_q, k_pools)) * IQ * JK
    err_k = np.abs(np.einsum("bhqd,bhkd->bhqk", q_pools, delta_k)) * IQ * JK
    gain = IQ * JK * np.abs(scores)
    return ~(gain > (err_q + err_k))


def ref_build_block_index(query, key, top_k, text_start_block,
                          text_end_block, num_blocks, prob_threshold,
                          block_neighbor_list, attenable):
    """rectified_hunyuan_attn.py:171-280 transliterated to NumPy (fp32).

    query: [B,H,Sv,D] visual rows; key: [B,H,S,D]; attenable = effective
    text length.  Returns (one_hot [B,H,NQ,num_blocks], probs, nogapr).
    """
    b, h, sv, d = query.shape
    nq = sv // BM
    Q_blocks = query.reshape(b, h, nq, BM, d)
    query_pool = Q_blocks.mean(-2)
    K_blocks = key[:, :, :nq * BN].reshape(b, h, nq, BN, d)
    key_pool_normal = K_blocks.mean(-2)
    key_text = key[:, :, nq * BN: nq * BN + attenable]
    key_pool = np.concatenate([key_pool_normal, key_text], axis=-2)

    scores_flat = np.einsum("bhqd,bhkd->bhqk", query_pool, key_pool)
    scores = scores_flat * (d ** -0.5)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)

    nogapr = ref_estimate_pr_gain(Q_blocks, K_blocks, query_pool,
                                  key_pool_normal,
                                  scores_flat[..., :-attenable])

    # IPAR (:218-223)
    normal = probs[..., :nq]
    nsum = normal.sum(-1, keepdims=True)
    tsum = probs[..., nq:].sum(-1, keepdims=True)
    denom = nsum * BN + tsum
    probs = np.concatenate([normal * BN / denom, tsum / denom], axis=-1)

    # top-p with top-k floor (:226-235)
    order = np.argsort(-probs, axis=-1, kind="stable")
    sorted_probs = np.take_along_axis(probs, order, axis=-1)
    csum = np.cumsum(sorted_probs, axis=-1)
    needed = np.maximum((csum <= prob_threshold).sum(-1) + 1, top_k)

    one_hot = np.zeros((b, h, nq, num_blocks), bool)
    rank = np.argsort(order, axis=-1)
    sel = rank < needed[..., None]
    one_hot[..., :probs.shape[-1]] = sel

    if block_neighbor_list is not None:
        nm = block_neighbor_list[:nq, :text_start_block].astype(bool)
        one_hot[:, :, :nm.shape[0], :text_start_block] |= nm[None, None]
    one_hot[..., text_start_block:text_end_block] = True
    return one_hot, probs, nogapr


def smooth_fixture(seed, b, h, grid, text_len, d, alpha=3.0):
    lt, lh, lw = grid
    sv = lt * lh * lw
    g = np.random.default_rng(seed)
    tt, hh, ww = np.meshgrid(np.arange(lt) / lt, np.arange(lh) / lh,
                             np.arange(lw) / lw, indexing="ij")
    coords = np.stack([tt, hh, ww], -1).reshape(-1, 3)
    w = g.normal(size=(3, 16)) * 3.0
    basis = np.concatenate([np.sin(coords @ w), np.cos(coords @ w)], -1)
    mix = g.normal(size=(2, h, 32, d)) / np.sqrt(32)
    field = np.einsum("sf,xhfd->xhsd", basis, mix)
    field = np.pad(field, ((0, 0), (0, 0), (0, text_len), (0, 0)))
    noise = g.normal(size=(2, h, sv + text_len, d))
    qk = (alpha * field + noise)[:, None].astype(np.float32)   # [2,1,H,S,D]
    return qk[0], qk[1]


def _compare(seed, attenable):
    b, h, d = 1, 2, 64
    grid, text_len = (8, 16, 16), 128
    sv = grid[0] * grid[1] * grid[2]
    nq = sv // BM
    q, k = smooth_fixture(seed, b, h, grid, text_len, d)
    g = np.random.default_rng(seed + 100)
    neighbors = np.eye(nq, dtype=bool)
    for sh in (-1, 1):
        neighbors |= np.eye(nq, k=sh, dtype=bool)

    top_k = max(1, int(0.2 * nq))
    nb_total = (sv + text_len) // BN
    want, ref_probs, ref_nogapr = ref_build_block_index(
        q[:, :, :sv], k, top_k, text_start_block=nq,
        text_end_block=nb_total, num_blocks=nb_total, prob_threshold=0.3,
        block_neighbor_list=neighbors, attenable=attenable)

    cfg = SparseConfig(top_k_floor=top_k, p_remain=0.3, layout="joint",
                       text_len=text_len)
    kz = k.copy()
    kz[:, :, sv + attenable:] = 0.0    # the wrapper zeroes invalid keys
    text_valid = (np.arange(text_len) < attenable)[None]
    plan = build_sparse_plan(
        jnp.asarray(q[:, :, :sv]), jnp.asarray(kz), jnp.asarray(kz), cfg,
        neighbor_mask=jnp.asarray(neighbors),
        text_valid=jnp.asarray(text_valid))
    got = np.asarray(plan.block_mask)
    return got, want, ref_probs, ref_nogapr


def test_composed_plan_bit_identical_to_reference_transliteration():
    mismatches = 0
    for seed, attenable in ((0, 128), (1, 90), (2, 128), (3, 40)):
        got, want, _, _ = _compare(seed, attenable)
        mismatches += int((got != want).sum())
    assert mismatches == 0


def test_gapr_and_ipar_match_reference_transliteration():
    from rectified_spaattn_tpu.sparse import ops
    b, h, d = 1, 2, 64
    grid, text_len, attenable = (8, 16, 16), 128, 128
    sv = grid[0] * grid[1] * grid[2]
    nq = sv // BM
    q, k = smooth_fixture(5, b, h, grid, text_len, d)
    qv = q[:, :, :sv]
    Qb = qv.reshape(b, h, nq, BM, d)
    Kb = k[:, :, :sv].reshape(b, h, nq, BN, d)
    qp, kp = Qb.mean(-2), Kb.mean(-2)
    scores = np.einsum("bhqd,bhkd->bhqk", qp, kp)
    want = ref_estimate_pr_gain(Qb, Kb, qp, kp, scores)
    got = np.asarray(ops.estimate_pr_gain(
        jnp.asarray(Qb), jnp.asarray(Kb), jnp.asarray(qp), jnp.asarray(kp),
        jnp.asarray(scores)))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Parity against the reference's ACTUAL torch code (VERDICT r2 item 2).
#
# reference_oracle.load imports rectified_*_attn.py from /root/reference
# (triton/diffusers stubbed); the builders below are the reference's own
# functions, not transliterations.  Tie semantics at the top-p cut remain
# the documented superset bound (see module docstring), so comparisons
# tolerate rows where our extra blocks are exactly tied at the threshold —
# on these peaked fixtures no such tie occurs and equality is bit-exact.
# ---------------------------------------------------------------------------

def _ref_joint_mask(module, q, k, top_k, text_len, attenable, neighbors,
                    p_remain=0.3):
    import torch
    sv = q.shape[2]
    nq = sv // BM
    nb_total = (sv + text_len) // BN
    tq = torch.from_numpy(np.ascontiguousarray(q))
    tk = torch.from_numpy(np.ascontiguousarray(k))
    one_hot, probs, nogapr = module._build_block_index_with_importance_optimized(
        tq, tk, top_k, BM, BN,
        text_start_block=nq, text_end_block=nb_total, num_blocks=nb_total,
        prob_threshold=p_remain,
        block_neighbor_list=torch.from_numpy(neighbors),
        attenable=attenable)
    return one_hot.numpy(), probs.numpy(), nogapr.numpy()


@pytest.mark.parametrize("module_name", [
    "rectified_spaattn.rectified_hunyuan_attn",
    "rectified_spaattn.rectified_cogvideo_attn",
    "rectified_spaattn.rectified_flux_attn",
])
def test_joint_plan_bit_identical_to_reference_code(module_name):
    """Our composed joint plan == the reference's own builder, run as-is
    (hunyuan: rectified_hunyuan_attn.py:171-280; the cog/flux builders
    are the same algorithm with cosmetic diffs — pinned here anyway)."""
    from reference_oracle import load
    module = load(module_name)
    mismatches = 0
    for seed, attenable in ((0, 128), (1, 90), (3, 40)):
        b, h, d = 1, 2, 64
        grid, text_len = (8, 16, 16), 128
        sv = grid[0] * grid[1] * grid[2]
        nq = sv // BM
        q, k = smooth_fixture(seed, b, h, grid, text_len, d)
        neighbors = np.eye(nq, dtype=bool)
        for sh in (-1, 1):
            neighbors |= np.eye(nq, k=sh, dtype=bool)
        top_k = max(1, int(0.2 * nq))
        want, _, _ = _ref_joint_mask(module, q[:, :, :sv], k, top_k,
                                     text_len, attenable, neighbors)

        cfg = SparseConfig(top_k_floor=top_k, p_remain=0.3, layout="joint",
                           text_len=text_len)
        kz = k.copy()
        kz[:, :, sv + attenable:] = 0.0
        text_valid = (np.arange(text_len) < attenable)[None]
        plan = build_sparse_plan(
            jnp.asarray(q[:, :, :sv]), jnp.asarray(kz), jnp.asarray(kz),
            cfg, neighbor_mask=jnp.asarray(neighbors),
            text_valid=jnp.asarray(text_valid))
        mismatches += int((np.asarray(plan.block_mask) != want).sum())
    assert mismatches == 0


@pytest.mark.parametrize("first_frame_blocks", [0, 2])
def test_visual_plan_bit_identical_to_reference_code(first_frame_blocks):
    """Wan2.1 visual-only builder (no text pooling, no IPAR,
    first-frame retention q<ffb ∧ k<ffb): our visual-layout plan == the
    reference's own rectified_wan21_attn.py:171-273."""
    import torch
    from reference_oracle import load
    module = load("rectified_spaattn.rectified_wan21_attn")
    b, h, d = 1, 2, 64
    grid = (8, 16, 16)
    sv = grid[0] * grid[1] * grid[2]
    nq = sv // BM
    q, k = smooth_fixture(7, b, h, grid, 0, d)
    neighbors = np.eye(nq, dtype=bool)
    for sh in (-1, 1):
        neighbors |= np.eye(nq, k=sh, dtype=bool)
    top_k = max(1, int(0.25 * nq))

    one_hot, _, _ = module._build_block_index_with_importance_optimized(
        torch.from_numpy(np.ascontiguousarray(q)),
        torch.from_numpy(np.ascontiguousarray(k)),
        top_k, BM, BN,
        text_start_block=nq, text_end_block=nq, num_blocks=nq,
        prob_threshold=0.3,
        block_neighbor_list=torch.from_numpy(neighbors),
        first_frame_blocks=first_frame_blocks)
    want = one_hot.numpy()

    cfg = SparseConfig(top_k_floor=top_k, p_remain=0.3, layout="visual",
                       first_frame_blocks=first_frame_blocks)
    plan = build_sparse_plan(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), cfg,
        neighbor_mask=jnp.asarray(neighbors))
    assert int((np.asarray(plan.block_mask) != want).sum()) == 0


def test_gapr_matches_reference_code():
    """ops.estimate_pr_gain == the reference's gapr_mask.estimate_pr_gain
    run as-is (gapr_mask.py:4-42)."""
    import torch
    from reference_oracle import load
    gm = load("rectified_spaattn.gapr_mask")
    b, h, d = 1, 2, 64
    grid = (8, 16, 16)
    sv = grid[0] * grid[1] * grid[2]
    nq = sv // BM
    q, k = smooth_fixture(9, b, h, grid, 0, d)
    Qb = q.reshape(b, h, nq, BM, d)
    Kb = k.reshape(b, h, nq, BN, d)
    qp, kp = Qb.mean(-2), Kb.mean(-2)
    scores = np.einsum("bhqd,bhkd->bhqk", qp, kp)
    from rectified_spaattn_tpu.sparse import ops
    want = gm.estimate_pr_gain(
        torch.from_numpy(Qb), torch.from_numpy(Kb),
        torch.from_numpy(qp), torch.from_numpy(kp),
        torch.from_numpy(scores)).numpy()
    got = np.asarray(ops.estimate_pr_gain(
        jnp.asarray(Qb), jnp.asarray(Kb), jnp.asarray(qp), jnp.asarray(kp),
        jnp.asarray(scores)))
    np.testing.assert_array_equal(got, want)


def test_tie_semantics_superset():
    """At an exact probability tie on the cut, the reference keeps an
    arbitrary one of the tied blocks; we keep all of them.  Our mask must
    be a SUPERSET whose extras are exactly tied with the threshold value —
    identical probability mass, so R/comp are unchanged."""
    probs = jnp.asarray(
        [[[[0.4, 0.2, 0.2, 0.1, 0.05, 0.05]]]], jnp.float32)
    from rectified_spaattn_tpu.sparse import ops
    keep = np.asarray(ops.topp_threshold_onehot_bisect(probs, 0.5, 1))
    # cumulative 0.4, 0.6 > 0.5 at the second block -> reference keeps 2;
    # block 2 ties block 1 at 0.2, so we keep 3
    assert keep.sum() == 3
    assert keep[0, 0, 0, :3].all()

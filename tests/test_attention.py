"""Integration tests for rectified sparse attention: kernel + plan +
rectification assembled, vs a from-scratch oracle (SURVEY §4 (c) analogue:
sparse output = masked-dense * R + comp; text rows exact)."""

import numpy as np
import jax.numpy as jnp

from rectified_spaattn_tpu.sparse import SparseConfig, build_sparse_plan
from rectified_spaattn_tpu.kernels import block_sparse_attention_reference
from rectified_spaattn_tpu.attention import (
    rectified_sparse_attention, attention, kv_validity)

BM = 128


def make(seed, b, h, s, d):
    g = np.random.default_rng(seed)
    return [g.normal(size=(b, h, s, d)).astype(np.float32) for _ in range(3)]


def oracle(q, k, v, cfg, neighbors, visual_len, tlen):
    """Assemble the expected output from already-tested pieces."""
    b, h, s, d = q.shape
    sv_pad = s - cfg.text_len if cfg.layout == "joint" else s
    valid = np.asarray(kv_validity(
        b, s, visual_len, sv_pad if cfg.layout == "joint" else None,
        jnp.asarray(tlen, jnp.int32) if tlen is not None else None,
        cfg.text_len))
    kz = np.where(valid[:, None, :, None], k, 0)
    vz = np.where(valid[:, None, :, None], v, 0)
    text_valid = None
    if cfg.layout == "joint":
        text_valid = (np.arange(cfg.text_len)[None, :] < np.asarray(tlen)[:, None])
    plan = build_sparse_plan(
        jnp.asarray(q[:, :, :sv_pad]), jnp.asarray(kz), jnp.asarray(vz), cfg,
        neighbor_mask=jnp.asarray(neighbors) if neighbors is not None else None,
        text_valid=jnp.asarray(text_valid) if text_valid is not None else None)
    sparse = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q[:, :, :sv_pad]), jnp.asarray(kz), jnp.asarray(vz),
        plan.block_mask, jnp.asarray(valid), block_m=cfg.block_m,
        block_n=cfg.block_n))
    r = np.repeat(np.asarray(plan.r_factor), cfg.block_m, axis=-1)
    comp = np.repeat(np.asarray(plan.comp), cfg.block_m, axis=-2)
    out_vis = sparse * r[..., None] + comp
    if cfg.layout == "joint":
        # text rows: exact attention over all valid keys
        from rectified_spaattn_tpu.kernels import dense_attention
        out_text = np.asarray(dense_attention(
            jnp.asarray(q[:, :, sv_pad:]), jnp.asarray(kz), jnp.asarray(vz),
            jnp.asarray(valid), mode="vanilla"))
        return np.concatenate([out_vis, out_text], axis=2)
    return out_vis


def test_joint_layout_end_to_end():
    b, h, d = 1, 2, 64
    nq, text_blocks = 3, 1
    cfg = SparseConfig(top_k_floor=1, p_remain=0.3, layout="joint",
                       text_len=text_blocks * BM)
    s = nq * BM + cfg.text_len
    q, k, v = make(0, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    visual_len = nq * BM
    tlen = np.array([100], np.int64)

    got = np.asarray(rectified_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg,
        jnp.asarray(neighbors), visual_len=visual_len,
        text_len_rt=jnp.asarray(tlen, jnp.int32), interpret=True))
    want = oracle(q, k, v, cfg, neighbors, visual_len, tlen)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_visual_layout_end_to_end():
    b, h, d = 1, 2, 64
    nq = 4
    cfg = SparseConfig(top_k_floor=1, p_remain=0.3, layout="visual",
                       first_frame_blocks=1)
    s = nq * BM
    q, k, v = make(1, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    visual_len = s - 40   # padded visual tail

    got = np.asarray(rectified_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg,
        jnp.asarray(neighbors), visual_len=visual_len, interpret=True))
    want = oracle(q, k, v, cfg, None if False else neighbors, visual_len, None)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_batched_equals_per_sample():
    """B=2 with DIFFERENT per-sample runtime text windows must equal two
    independent B=1 runs — catches batch-broadcast mistakes in the plan,
    the validity windows, and the kernel grid (production serving batches
    prompts; nothing else in the suite ran the full path at B>1)."""
    b, h, d = 2, 2, 64
    nq, text_blocks = 3, 1
    cfg = SparseConfig(top_k_floor=1, p_remain=0.3, layout="joint",
                       text_len=text_blocks * BM)
    s = nq * BM + cfg.text_len
    q, k, v = make(7, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    visual_len = nq * BM
    tlen = np.array([100, 37], np.int64)

    got = np.asarray(rectified_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg,
        jnp.asarray(neighbors), visual_len=visual_len,
        text_len_rt=jnp.asarray(tlen, jnp.int32), interpret=True))
    assert got.shape == (b, h, s, d)
    for i in range(b):
        want_i = np.asarray(rectified_sparse_attention(
            jnp.asarray(q[i:i + 1]), jnp.asarray(k[i:i + 1]),
            jnp.asarray(v[i:i + 1]), cfg, jnp.asarray(neighbors),
            visual_len=visual_len,
            text_len_rt=jnp.asarray(tlen[i:i + 1], jnp.int32),
            interpret=True))
        np.testing.assert_allclose(got[i:i + 1], want_i, rtol=2e-3,
                                   atol=2e-3)


def test_grouped_rows_equals_ungrouped():
    """cfg.group_rows is a pure execution-strategy knob: outputs must be
    identical to the one-row-per-program kernel (the executed mask always
    equals the planned mask).  nq=3 with group 4 also exercises the
    empty-row padding path."""
    b, h, d = 1, 2, 64
    nq, text_blocks = 3, 1
    s = nq * BM + text_blocks * BM
    q, k, v = make(5, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    tlen = jnp.asarray(np.array([77]), jnp.int32)
    outs = {}
    for gr in (1, 2, 4):
        cfg = SparseConfig(top_k_floor=1, p_remain=0.3, layout="joint",
                           text_len=text_blocks * BM, group_rows=gr)
        outs[gr] = np.asarray(rectified_sparse_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg,
            jnp.asarray(neighbors), visual_len=nq * BM,
            text_len_rt=tlen, interpret=True))
    np.testing.assert_allclose(outs[2], outs[1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[4], outs[1], rtol=2e-5, atol=2e-5)


def test_dense_modes_dispatch():
    b, h, s, d = 1, 2, 256, 64
    q, k, v = make(2, b, h, s, d)
    out_f = np.asarray(attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), mode="flash",
                                 visual_len=s, interpret=True))
    out_v = np.asarray(attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), mode="vanilla",
                                 visual_len=s))
    np.testing.assert_allclose(out_f, out_v, rtol=1e-4, atol=1e-5)


def test_sparse_at_full_density_approaches_dense():
    """With p_remain=1.0 every block is selected: R≈1, comp≈0 and the
    sparse path must reproduce dense attention (reference A/B property)."""
    b, h, d = 1, 1, 64
    nq = 3
    cfg = SparseConfig(top_k_floor=nq, p_remain=1.0, layout="visual")
    s = nq * BM
    q, k, v = make(3, b, h, s, d)
    got = np.asarray(rectified_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg, None,
        visual_len=s, interpret=True))
    want = np.asarray(attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), mode="vanilla", visual_len=s))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_packed_kv_and_split_q_equal_baseline():
    """Producer-packed KV + producer-split q (the long-context memory
    path, VERDICT r3 #4) must match the baseline path bit-for-bit: the
    kernel window-masks every non-clean block, so it never needs the
    zeroed-KV copies, and q_text replaces the interior-axis slice."""
    b, h, d = 1, 2, 64
    nq, text_blocks = 3, 1
    cfg = SparseConfig(top_k_floor=1, p_remain=0.3, layout="joint",
                       text_len=text_blocks * BM)
    sv = nq * BM
    s = sv + cfg.text_len
    q, k, v = make(3, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    tlen = jnp.asarray(np.array([100]), jnp.int32)

    want = np.asarray(rectified_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg,
        jnp.asarray(neighbors), visual_len=sv, text_len_rt=tlen,
        interpret=True))

    kv = jnp.concatenate([jnp.asarray(k), jnp.asarray(v)], axis=-1)
    got = np.asarray(rectified_sparse_attention(
        jnp.asarray(q[:, :, :sv]), kv[..., :d], kv[..., d:], cfg,
        jnp.asarray(neighbors), visual_len=sv, text_len_rt=tlen,
        interpret=True, kv_packed=kv, q_text=jnp.asarray(q[:, :, sv:])))
    np.testing.assert_array_equal(got, want)


def test_grouped_rows_compose_with_packed_kv():
    """group_rows > 1 gathers from the producer-packed [K|V] stream
    exactly like the single-row kernel (VERDICT r4 next-round #5: the
    grouped byte win and the long-context packed path were mutually
    exclusive by assertion only — the grouped kernel reads the same
    packed layout, so the composition must be bit-identical)."""
    b, h, d = 1, 2, 64
    nq, text_blocks = 4, 1
    cfg = SparseConfig(top_k_floor=1, p_remain=0.3, layout="joint",
                       text_len=text_blocks * BM, group_rows=2)
    sv = nq * BM
    s = sv + cfg.text_len
    q, k, v = make(9, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    tlen = jnp.asarray(np.array([90]), jnp.int32)

    want = np.asarray(rectified_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg,
        jnp.asarray(neighbors), visual_len=sv, text_len_rt=tlen,
        interpret=True))
    kv = jnp.concatenate([jnp.asarray(k), jnp.asarray(v)], axis=-1)
    got = np.asarray(rectified_sparse_attention(
        jnp.asarray(q[:, :, :sv]), kv[..., :d], kv[..., d:], cfg,
        jnp.asarray(neighbors), visual_len=sv, text_len_rt=tlen,
        interpret=True, kv_packed=kv, q_text=jnp.asarray(q[:, :, sv:])))
    np.testing.assert_array_equal(got, want)


def test_density_only_returns_executed_plan_density():
    """rectified_sparse_attention(density_only=True) returns the mean
    executed mask density of EXACTLY the plan the real call would run
    (same padding / kv-validity / text windows) — the pipelines' density
    probe reads this scalar from a sibling program because the axon PJRT
    rejects host callbacks inside compiled programs (VERDICT r4 weak #1:
    full-depth benches never logged density)."""
    import jax
    b, h, d = 1, 2, 64
    nq, text_blocks = 3, 1
    cfg = SparseConfig(top_k_floor=1, p_remain=0.3, layout="joint",
                       text_len=text_blocks * BM)
    s = nq * BM + cfg.text_len
    q, k, v = make(0, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    tlen = jnp.asarray(np.array([100]), jnp.int32)

    dens = float(jax.jit(lambda q, k, v: rectified_sparse_attention(
        q, k, v, cfg, jnp.asarray(neighbors), visual_len=nq * BM,
        text_len_rt=tlen, density_only=True))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    assert 0.0 < dens <= 1.0
    # cross-check against the plan built the same way the real call does
    valid = kv_validity(b, s, nq * BM, nq * BM, tlen)
    kz = jnp.where(jnp.asarray(valid)[:, None, :, None], jnp.asarray(k), 0)
    vz = jnp.where(jnp.asarray(valid)[:, None, :, None], jnp.asarray(v), 0)
    plan = build_sparse_plan(
        jnp.asarray(q[:, :, :nq * BM]), kz, vz, cfg,
        neighbor_mask=jnp.asarray(neighbors),
        text_valid=jnp.arange(cfg.text_len)[None] < 100)
    want = float(jnp.mean(plan.counts)) / plan.block_mask.shape[-1]
    assert abs(dens - want) < 1e-6, (dens, want)


def test_row_chunked_rectified_equals_oneshot():
    """plan_row_chunk < NQ routes both the plan build AND the
    rectification apply through row-tiled fori_loops (the long-context
    memory path); output must be bit-identical to the one-shot path."""
    import dataclasses
    b, h, d = 1, 2, 64
    nq, text_blocks = 5, 1
    base = SparseConfig(top_k_floor=1, p_remain=0.3, layout="joint",
                        text_len=text_blocks * BM)
    sv = nq * BM
    s = sv + base.text_len
    q, k, v = make(11, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    tlen = jnp.asarray(np.array([100]), jnp.int32)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    want = np.asarray(rectified_sparse_attention(
        *args, base, jnp.asarray(neighbors), visual_len=sv,
        text_len_rt=tlen, interpret=True))
    cfg = dataclasses.replace(base, plan_row_chunk=2, plan_kv_tile=2)
    got = np.asarray(rectified_sparse_attention(
        *args, cfg, jnp.asarray(neighbors), visual_len=sv,
        text_len_rt=tlen, interpret=True))
    np.testing.assert_array_equal(got, want)

def test_cfg_kv_pack_is_equal_including_unaligned_visual():
    """SparseConfig.kv_pack (cfg-driven producer pack inside the call)
    equals the unpacked path bit-for-bit — including a NON-block-aligned
    visual region (the pack happens after the pad insert, so the
    alignment requirement of the explicit kv_packed arg does not apply)
    and composed with group_rows=2.  This is the lever the pipelines
    thread for full-depth 16.4B I2V (kills the kernel's own packed copy,
    VERDICT r4 #3/#5)."""
    b, h, d = 1, 2, 64
    text_blocks = 1
    for sv, gr in ((4 * BM, 1), (3 * BM + 40, 1), (4 * BM, 2)):
        nq = -(-sv // BM)
        base = dict(top_k_floor=1, p_remain=0.3, layout="joint",
                    text_len=text_blocks * BM, group_rows=gr)
        s = nq * BM + base["text_len"]
        q, k, v = make(11, b, h, s, d)
        # the true visual tokens occupy [:sv]; the pipelines hand the
        # padded stream to the call, which re-inserts pad between
        # visual and text when sv is not block-aligned
        qq = np.concatenate([q[:, :, :sv], q[:, :, nq * BM:]], axis=2)
        kk = np.concatenate([k[:, :, :sv], k[:, :, nq * BM:]], axis=2)
        vv = np.concatenate([v[:, :, :sv], v[:, :, nq * BM:]], axis=2)
        neighbors = np.eye(nq, dtype=bool)
        tlen = jnp.asarray(np.array([90]), jnp.int32)
        want = np.asarray(rectified_sparse_attention(
            jnp.asarray(qq), jnp.asarray(kk), jnp.asarray(vv),
            SparseConfig(**base), jnp.asarray(neighbors), visual_len=sv,
            text_len_rt=tlen, interpret=True))
        got = np.asarray(rectified_sparse_attention(
            jnp.asarray(qq), jnp.asarray(kk), jnp.asarray(vv),
            SparseConfig(**base, kv_pack=True), jnp.asarray(neighbors),
            visual_len=sv, text_len_rt=tlen, interpret=True))
        np.testing.assert_array_equal(got, want)


def test_cfg_kv_pack_visual_layout_is_equal():
    """kv_pack under the visual layout (Wan family: no text in the
    self-attn stream) — the path the full-depth I2V runs use."""
    b, h, d = 1, 2, 64
    nq = 4
    sv = nq * BM - 30          # unaligned ragged tail
    s = nq * BM
    q, k, v = make(13, b, h, s, d)
    q[:, :, sv:] = 0; k[:, :, sv:] = 0; v[:, :, sv:] = 0
    neighbors = np.eye(nq, dtype=bool)
    base = dict(top_k_floor=1, p_remain=0.3, layout="visual")
    want = np.asarray(rectified_sparse_attention(
        jnp.asarray(q[:, :, :sv]), jnp.asarray(k[:, :, :sv]),
        jnp.asarray(v[:, :, :sv]), SparseConfig(**base),
        jnp.asarray(neighbors), visual_len=sv, interpret=True))
    got = np.asarray(rectified_sparse_attention(
        jnp.asarray(q[:, :, :sv]), jnp.asarray(k[:, :, :sv]),
        jnp.asarray(v[:, :, :sv]), SparseConfig(**base, kv_pack=True),
        jnp.asarray(neighbors), visual_len=sv, interpret=True))
    np.testing.assert_array_equal(got, want)

def test_head_chunk_is_equal_to_full_heads():
    """SparseConfig.head_chunk (head-tiled fori_loop execution) is
    bit-identical to the one-pass path — including composed with
    kv_pack and group_rows, under both layouts, and for the
    density_only probe (mean over equal head tiles = global mean).
    This is the second peak-HBM lever for full-depth 16.4B I2V.

    Tolerance: the fori_loop body fuses differently from the one-shot
    program (XLA reassociates the softmax/rectify reductions per tile),
    so outputs can differ in the last fp32 ulp — same 1-2 ulp band as
    the row-tiled ring composition test."""
    b, h, d = 1, 4, 64
    nq = 4
    text_blocks = 1
    base = dict(top_k_floor=1, p_remain=0.3, layout="joint",
                text_len=text_blocks * BM)
    s = nq * BM + base["text_len"]
    q, k, v = make(17, b, h, s, d)
    neighbors = np.eye(nq, dtype=bool)
    tlen = jnp.asarray(np.array([90]), jnp.int32)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = np.asarray(rectified_sparse_attention(
        *args, SparseConfig(**base), jnp.asarray(neighbors),
        visual_len=nq * BM, text_len_rt=tlen, interpret=True))
    for extra in ({}, {"kv_pack": True}, {"group_rows": 2},
                  {"kv_pack": True, "group_rows": 2}):
        for hc in (1, 2):
            got = np.asarray(rectified_sparse_attention(
                *args, SparseConfig(**base, head_chunk=hc, **extra),
                jnp.asarray(neighbors), visual_len=nq * BM,
                text_len_rt=tlen, interpret=True))
            np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)
    # density probe equality
    dw = float(rectified_sparse_attention(
        *args, SparseConfig(**base), jnp.asarray(neighbors),
        visual_len=nq * BM, text_len_rt=tlen, interpret=True,
        density_only=True))
    dg = float(rectified_sparse_attention(
        *args, SparseConfig(**base, head_chunk=2), jnp.asarray(neighbors),
        visual_len=nq * BM, text_len_rt=tlen, interpret=True,
        density_only=True))
    np.testing.assert_allclose(dg, dw, rtol=1e-6)


def test_head_chunk_visual_layout_unaligned():
    """head_chunk under the visual layout with a ragged visual tail
    (the Wan I2V configuration) — pad insert happens per head tile."""
    b, h, d = 1, 4, 64
    nq = 4
    sv = nq * BM - 30
    q, k, v = make(19, b, h, sv, d)
    neighbors = np.eye(nq, dtype=bool)
    base = dict(top_k_floor=1, p_remain=0.3, layout="visual")
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = np.asarray(rectified_sparse_attention(
        *args, SparseConfig(**base), jnp.asarray(neighbors),
        visual_len=sv, interpret=True))
    got = np.asarray(rectified_sparse_attention(
        *args, SparseConfig(**base, head_chunk=2, kv_pack=True),
        jnp.asarray(neighbors), visual_len=sv, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_head_chunk_dense_mode_is_equal():
    """head_chunk in the DENSE branch of attention() (the full-depth
    denominator next to the 16.4B tree) — identical output."""
    from rectified_spaattn_tpu.attention import attention
    b, h, d = 1, 4, 64
    nq = 3
    base = dict(top_k_floor=1, p_remain=0.3, layout="joint",
                text_len=BM)
    s = nq * BM + BM
    q, k, v = make(23, b, h, s, d)
    tlen = jnp.asarray(np.array([70]), jnp.int32)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = np.asarray(attention(
        *args, mode="vanilla", cfg=SparseConfig(**base),
        visual_len=nq * BM, text_len_rt=tlen, interpret=True))
    got = np.asarray(attention(
        *args, mode="vanilla", cfg=SparseConfig(**base, head_chunk=2),
        visual_len=nq * BM, text_len_rt=tlen, interpret=True))
    np.testing.assert_array_equal(got, want)

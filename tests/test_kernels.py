"""Kernel tests (SURVEY §4 implication (b)): Pallas block-sparse output vs
dense softmax oracle — exact with a full mask, masked-dense with random
masks — run in interpreter mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from rectified_spaattn_tpu.kernels import (
    block_sparse_flash_attention,
    block_sparse_attention_reference,
    dense_attention,
)
from rectified_spaattn_tpu.sparse.ops import mask_to_indices

BM = BN = 128


def make_inputs(seed, b, h, nq, nb, d, dtype=np.float32):
    g = np.random.default_rng(seed)
    q = g.normal(size=(b, h, nq * BM, d)).astype(dtype)
    k = g.normal(size=(b, h, nb * BN, d)).astype(dtype)
    v = g.normal(size=(b, h, nb * BN, d)).astype(dtype)
    return q, k, v


def run_sparse(q, k, v, mask, text_len_rt, visual_len, text_start):
    idx, counts = mask_to_indices(jnp.asarray(mask))
    return np.asarray(block_sparse_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), idx, counts,
        jnp.asarray(text_len_rt, dtype=jnp.int32),
        visual_len=visual_len, text_start=text_start, block_m=BM, block_n=BN,
        interpret=True))


def test_full_mask_equals_dense():
    b, h, nq, nb, d = 1, 2, 2, 3, 64
    q, k, v = make_inputs(0, b, h, nq, nb, d)
    mask = np.ones((b, h, nq, nb), bool)
    out = run_sparse(q, k, v, mask, np.zeros(b), visual_len=nb * BN,
                     text_start=None)
    want = np.asarray(dense_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mode="vanilla"))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-5)


def test_random_mask_matches_reference():
    b, h, nq, nb, d = 2, 2, 3, 5, 64
    q, k, v = make_inputs(1, b, h, nq, nb, d)
    g = np.random.default_rng(2)
    mask = g.uniform(size=(b, h, nq, nb)) < 0.5
    mask[..., 0] = True  # ensure >= 1 block per row
    out = run_sparse(q, k, v, mask, np.zeros(b), visual_len=nb * BN,
                     text_start=None)
    kv_valid = jnp.ones((b, nb * BN), bool)
    want = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        kv_valid, block_m=BM, block_n=BN))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-5)


def test_validity_visual_prefix_and_text_window():
    # Layout: [3 visual blocks (last 40 tokens padding) | 1 text block
    # (only 100 tokens valid)]
    b, h, nq, d = 1, 2, 3, 64
    nb_vis, text_blocks = 3, 1
    nb = nb_vis + text_blocks
    visual_len = nb_vis * BN - 40
    text_start = nb_vis * BN
    tlen = np.array([100])
    q, k, v = make_inputs(3, b, h, nq, nb, d)
    g = np.random.default_rng(4)
    mask = g.uniform(size=(b, h, nq, nb)) < 0.6
    mask[..., -1] = True  # text block forced, as the pipeline does

    out = run_sparse(q, k, v, mask, tlen, visual_len=visual_len,
                     text_start=text_start)

    kv_valid = np.zeros((b, nb * BN), bool)
    kv_valid[:, :visual_len] = True
    kv_valid[:, text_start:text_start + tlen[0]] = True
    want = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        jnp.asarray(kv_valid), block_m=BM, block_n=BN))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-5)


def test_bf16_close_to_fp32_oracle():
    b, h, nq, nb, d = 1, 1, 2, 3, 64
    q, k, v = make_inputs(5, b, h, nq, nb, d)
    mask = np.random.default_rng(6).uniform(size=(b, h, nq, nb)) < 0.7
    mask[..., 0] = True
    out_bf16 = run_sparse(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16), mask, np.zeros(b),
                          visual_len=nb * BN, text_start=None)
    kv_valid = jnp.ones((b, nb * BN), bool)
    want = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        kv_valid, block_m=BM, block_n=BN))
    np.testing.assert_allclose(out_bf16.astype(np.float32), want,
                               rtol=2e-2, atol=2e-2)


def test_single_block_rows():
    # counts == 1 everywhere: kernel degenerates to one-tile softmax.
    b, h, nq, nb, d = 1, 1, 2, 4, 64
    q, k, v = make_inputs(7, b, h, nq, nb, d)
    mask = np.zeros((b, h, nq, nb), bool)
    mask[..., 0, 2] = True
    mask[..., 1, 0] = True
    out = run_sparse(q, k, v, mask, np.zeros(b), visual_len=nb * BN,
                     text_start=None)
    want = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        jnp.ones((b, nb * BN), bool), block_m=BM, block_n=BN))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-5)


def test_zero_count_rows_produce_zero_output():
    """Ring SP shards can own NONE of a row's selected blocks: count == 0
    rows must emit zeros (and issue no DMAs — the TPU path guards the
    prologue with pl.when(count > 0) so scratch semaphores stay clean)."""
    b, h, nq, nb, d = 1, 2, 3, 4, 64
    q, k, v = make_inputs(13, b, h, nq, nb, d)
    mask = np.zeros((b, h, nq, nb), bool)
    mask[:, :, 0, :2] = True       # row 0 keeps two blocks, rows 1-2 none
    out = run_sparse(q, k, v, mask, np.zeros(b), visual_len=nb * BN,
                     text_start=None)
    want_row0 = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q[:, :, :BM]), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(mask[:, :, :1]), jnp.ones((b, nb * BN), bool),
        block_m=BM, block_n=BN))
    np.testing.assert_allclose(out[:, :, :BM], want_row0, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_array_equal(out[:, :, BM:], 0.0)


def test_zero_count_rows_stats_are_mergeable():
    """return_stats for an empty row must merge as a no-op: l == 0."""
    b, h, nq, nb, d = 1, 1, 2, 3, 64
    q, k, v = make_inputs(14, b, h, nq, nb, d)
    mask = np.zeros((b, h, nq, nb), bool)
    mask[:, :, 0, 1] = True
    idx, counts = mask_to_indices(jnp.asarray(mask))
    _, m, l = block_sparse_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), idx, counts,
        jnp.zeros((b,), jnp.int32), visual_len=nb * BN, text_start=None,
        block_m=BM, block_n=BN, interpret=True, return_stats=True)
    np.testing.assert_array_equal(np.asarray(l)[:, :, BM:], 0.0)


def test_paired_kernel_matches_reference():
    from rectified_spaattn_tpu.kernels import (
        block_sparse_flash_attention_paired)
    from rectified_spaattn_tpu.sparse.ops import pair_rows
    import jax.numpy as jnp

    b, h, nq, nb, d = 1, 2, 4, 5, 64
    q, k, v = make_inputs(9, b, h, nq, nb, d)
    g = np.random.default_rng(10)
    mask = g.uniform(size=(b, h, nq, nb)) < 0.5
    mask[..., 0] = True
    visual_len = nb * BN - 30
    idx, counts, rowbits, clean = pair_rows(jnp.asarray(mask),
                                            clean_blocks=visual_len // BN)
    out = np.asarray(block_sparse_flash_attention_paired(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), idx, counts,
        rowbits, clean, jnp.zeros((b,), jnp.int32), visual_len=visual_len,
        text_start=None, block_m=BM, block_n=BN, interpret=True))
    kv_valid = np.zeros((b, nb * BN), bool)
    kv_valid[:, :visual_len] = True
    want = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        jnp.asarray(kv_valid), block_m=BM, block_n=BN))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_grouped_kernel_matches_reference():
    from rectified_spaattn_tpu.kernels import (
        block_sparse_flash_attention_grouped)
    from rectified_spaattn_tpu.sparse.ops import group_rows

    b, h, nq, nb, d = 1, 2, 8, 6, 64
    q, k, v = make_inputs(21, b, h, nq, nb, d)
    g = np.random.default_rng(22)
    mask = g.uniform(size=(b, h, nq, nb)) < 0.4
    mask[..., 0] = True
    visual_len = nb * BN - 50
    for grp in (1, 2, 4, 8):
        idx, counts, rowbits, clean = group_rows(
            jnp.asarray(mask), grp, clean_blocks=visual_len // BN)
        out = np.asarray(block_sparse_flash_attention_grouped(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), idx, counts,
            rowbits, clean, jnp.zeros((b,), jnp.int32), group=grp,
            visual_len=visual_len, text_start=None, block_m=BM, block_n=BN,
            interpret=True))
        kv_valid = np.zeros((b, nb * BN), bool)
        kv_valid[:, :visual_len] = True
        want = np.asarray(block_sparse_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), jnp.asarray(kv_valid), block_m=BM,
            block_n=BN))
        np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-5,
                                   err_msg=f"group={grp}")


def test_group_rows_membership_bits():
    from rectified_spaattn_tpu.sparse.ops import group_rows
    g = np.random.default_rng(23)
    mask = g.uniform(size=(1, 1, 8, 9)) < 0.4
    mask[..., 0] = True
    idx, counts, rowbits, _ = map(
        np.asarray, group_rows(jnp.asarray(mask), 4))
    for p in range(2):
        rows = mask[0, 0, 4 * p: 4 * p + 4]
        union = np.where(rows.any(axis=0))[0]
        n = counts[0, 0, p]
        assert n == len(union)
        np.testing.assert_array_equal(idx[0, 0, p, :n], union)
        for s_ in range(n):
            col = idx[0, 0, p, s_]
            for r in range(4):
                assert bool(rowbits[0, 0, p, s_] & (1 << r)) == bool(
                    rows[r, col])


def test_pair_rows_membership():
    from rectified_spaattn_tpu.sparse.ops import pair_rows
    import jax.numpy as jnp
    g = np.random.default_rng(11)
    mask = g.uniform(size=(1, 1, 6, 9)) < 0.4
    mask[..., 0] = True
    idx, counts, rowbits, _ = pair_rows(jnp.asarray(mask))
    idx, counts, rowbits = map(np.asarray, (idx, counts, rowbits))
    for p in range(3):
        union = np.where(mask[0, 0, 2 * p] | mask[0, 0, 2 * p + 1])[0]
        n = counts[0, 0, p]
        assert n == len(union)
        np.testing.assert_array_equal(idx[0, 0, p, :n], union)
        for s_ in range(n):
            col = idx[0, 0, p, s_]
            bits = rowbits[0, 0, p, s_]
            assert bool(bits & 1) == bool(mask[0, 0, 2 * p, col])
            assert bool(bits & 2) == bool(mask[0, 0, 2 * p + 1, col])


def test_dense_attention_vanilla_masks_invalid_keys():
    b, h, s, d = 1, 2, 256, 64
    g = np.random.default_rng(8)
    q = g.normal(size=(b, h, s, d)).astype(np.float32)
    k = g.normal(size=(b, h, s, d)).astype(np.float32)
    v = g.normal(size=(b, h, s, d)).astype(np.float32)
    kv_valid = np.ones((b, s), bool)
    kv_valid[:, 200:] = False
    got = np.asarray(dense_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(kv_valid), mode="vanilla"))
    # oracle: drop the invalid keys entirely
    want = np.asarray(dense_attention(
        jnp.asarray(q), jnp.asarray(k[:, :, :200]), jnp.asarray(v[:, :, :200]),
        mode="vanilla"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_long_contiguous_runs_match_reference():
    """Masks with long contiguous block runs exercise every coalesced-DMA
    class (1/2/4/8/16 blocks per descriptor) across multiple chunks."""
    b, h, nq, nb, d = 1, 2, 2, 40, 64
    q, k, v = make_inputs(11, b, h, nq, nb, d)
    mask = np.zeros((b, h, nq, nb), bool)
    mask[0, 0, 0, 0:19] = True      # 16+2+1 decomposition
    mask[0, 0, 0, 21:24] = True
    mask[0, 0, 1, 5:37] = True      # crosses two chunk boundaries
    mask[0, 1, 0, 0:40] = True      # full row: 16,16,8
    mask[0, 1, 1, 39] = True        # single trailing block
    out = run_sparse(q, k, v, mask, np.zeros(b), visual_len=nb * BN,
                     text_start=None)
    kv_valid = jnp.ones((b, nb * BN), bool)
    want = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        kv_valid, block_m=BM, block_n=BN))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["int8", "mxu8"])
@pytest.mark.slow
def test_int8_kv_quant_close_to_bf16(mode):
    """int8 KV gather (kv_quant, both consumption modes) tracks the
    full-precision kernel within quantization noise on random masks incl.
    validity windows.  mxu8 additionally quantizes q and p in-kernel
    (int8 x int8 MXU dots), so its tolerance is slightly wider."""
    import jax.numpy as jnp
    from rectified_spaattn_tpu.sparse.ops import (mask_to_indices,
                                                  quantize_kv_blocks)
    b, h, nq, nb, d = 1, 2, 3, 6, 64
    q, k, v = make_inputs(31, b, h, nq, nb, d)
    g = np.random.default_rng(32)
    mask = g.uniform(size=(b, h, nq, nb)) < 0.5
    mask[..., 0] = True
    visual_len = nb * BN - 40
    kz = np.where((np.arange(nb * BN) < visual_len)[None, None, :, None],
                  k, 0.0)
    vz = np.where((np.arange(nb * BN) < visual_len)[None, None, :, None],
                  v, 0.0)
    idx, counts = mask_to_indices(jnp.asarray(mask))
    quant = quantize_kv_blocks(jnp.asarray(kz), jnp.asarray(vz), BN)
    got = np.asarray(block_sparse_flash_attention(
        jnp.asarray(q), jnp.asarray(kz), jnp.asarray(vz), idx, counts,
        jnp.zeros((b,), jnp.int32), visual_len=visual_len, text_start=None,
        block_m=BM, block_n=BN, interpret=True, kv_quant=quant,
        quant_mode=mode))
    want = np.asarray(block_sparse_flash_attention(
        jnp.asarray(q), jnp.asarray(kz), jnp.asarray(vz), idx, counts,
        jnp.zeros((b,), jnp.int32), visual_len=visual_len, text_start=None,
        block_m=BM, block_n=BN, interpret=True))
    err = np.abs(got - want)
    lim_max, lim_mean = (0.06, 0.01) if mode == "int8" else (0.09, 0.015)
    assert err.max() < lim_max and err.mean() < lim_mean, (
        err.max(), err.mean())


@pytest.mark.parametrize("chunk", [8, 16, 24, 32])
def test_chunk_size_and_prefetch_pinned(chunk):
    """CI pin for the kernel's tuned defaults (VERDICT r3 weak #6): every
    chunk_blocks setting must match the masked-dense oracle, and
    prefetch_next must be BIT-EXACT against prefetch-off at every chunk
    size — the cross-row chunk-0 prefetch is a DMA-scheduling change only,
    so any numeric difference is a bug."""
    b, h, nq, nb, d = 1, 2, 3, 40, 64
    q, k, v = make_inputs(41, b, h, nq, nb, d)
    g = np.random.default_rng(42)
    mask = g.uniform(size=(b, h, nq, nb)) < 0.5
    mask[..., 0] = True
    mask[0, 0, 1] = True            # one full row: multiple clean chunks
    visual_len = nb * BN - 40
    idx, counts = mask_to_indices(jnp.asarray(mask))

    def run(prefetch):
        return np.asarray(block_sparse_flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), idx, counts,
            jnp.zeros((b,), jnp.int32), visual_len=visual_len,
            text_start=None, block_m=BM, block_n=BN, chunk_blocks=chunk,
            interpret=True, prefetch_next=prefetch))

    on, off = run(True), run(False)
    np.testing.assert_array_equal(on, off)

    kv_valid = np.zeros((b, nb * BN), bool)
    kv_valid[:, :visual_len] = True
    want = np.asarray(block_sparse_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        jnp.asarray(kv_valid), block_m=BM, block_n=BN))
    np.testing.assert_allclose(on, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("bm", [128, 256, 512])
@pytest.mark.slow
def test_windowed_dense_padded_q_tiles(bm):
    """The dense fallback pads the QUERY axis independently of KV so any
    tile width is usable regardless of sequence divisibility (the kernel
    supports Sq != Skv); every width must equal the vanilla oracle and
    return the caller's sequence length."""
    import jax
    from rectified_spaattn_tpu.attention.modes import _windowed_dense_flash
    from rectified_spaattn_tpu.attention.rectified import kv_validity
    from rectified_spaattn_tpu.kernels import dense_attention

    b, h, d = 1, 2, 32
    sv, text_slot, tl = 300, 64, 40     # 300 visual -> s=364: no bm divides
    s = sv + text_slot
    rng = jax.random.PRNGKey(3)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (b, h, s, d))
               for i in range(3))
    tlen = jnp.array([tl], jnp.int32)
    valid = kv_validity(b, s, sv, sv, tlen, text_slot)
    want = np.asarray(dense_attention(q, k, v, valid, mode="vanilla"))

    got = _windowed_dense_flash(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), visual_len=sv, text_start=sv, tlen=tlen,
        block_m=bm, interpret=True)
    assert got.shape == (b, h, s, d)
    np.testing.assert_allclose(
        np.asarray(got[:, :, :sv + tl], np.float32),
        want[:, :, :sv + tl], atol=2e-2, rtol=2e-2)


def test_windowed_dense_kv_packed_bit_exact():
    """Producer-packed KV must route through the identical kernel program:
    bit-equal to the unpacked call (the long-context dense-denominator
    memory lever, scripts/bench_longctx.py --dense_only --packed)."""
    import jax
    from rectified_spaattn_tpu.attention.modes import _windowed_dense_flash

    b, h, d = 1, 2, 32
    sv, text_slot, tl = 256, 128, 40          # block-aligned s = 384
    s = sv + text_slot
    rng = jax.random.PRNGKey(9)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i),
                                 (b, h, s, d)).astype(jnp.bfloat16)
               for i in range(3))
    tlen = jnp.array([tl], jnp.int32)

    want = np.asarray(_windowed_dense_flash(
        q, k, v, visual_len=sv, text_start=sv, tlen=tlen,
        block_m=128, interpret=True))
    kv = jnp.concatenate([k, v], axis=-1)
    got = np.asarray(_windowed_dense_flash(
        q, kv[..., :d], kv[..., d:], visual_len=sv, text_start=sv,
        tlen=tlen, block_m=128, interpret=True, kv_packed=kv))
    np.testing.assert_array_equal(got, want)

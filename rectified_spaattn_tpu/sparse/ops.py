"""Core array math for the sparse-mask pipeline.

Everything here is pure jnp on static shapes — it jits into a handful of
fused GEMM/softmax/sort/scan ops with no host synchronisation, replacing the
reference's torch pipeline (rectified_hunyuan_attn.py:171-280) 1:1 in
semantics but not in structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def block_pool(x: jax.Array, block: int) -> jax.Array:
    """Mean-pool [..., S, D] into [..., S//block, D] blocks (fp32 accum)."""
    s, d = x.shape[-2], x.shape[-1]
    assert s % block == 0, (s, block)
    xb = x.reshape(*x.shape[:-2], s // block, block, d)
    return jnp.mean(xb.astype(jnp.float32), axis=-2)


def pooled_scores(q_pool: jax.Array, k_pool: jax.Array) -> jax.Array:
    """Unscaled pooled attention scores [B,H,NQ,NK] in fp32.

    (reference: rectified_hunyuan_attn.py:196-205 — `attention_scores_flat`;
    the sm-scale is applied by callers where the reference applies it.)
    """
    return jnp.einsum("bhqd,bhkd->bhqk", q_pool, k_pool,
                      preferred_element_type=jnp.float32)


def estimate_pr_gain(q_blocks: jax.Array, k_blocks: jax.Array,
                     q_pools: jax.Array, k_pools: jax.Array,
                     scores_unscaled: jax.Array) -> jax.Array:
    """GAPR — gain-aware pooling rectification mask.

    Decides per (head, q-block, k-block) whether the pooled-probability
    correction for a non-selected block is trustworthy: the estimated
    pooling error (first-order |Δq·k̄| + |q̄·Δk| terms) must not exceed the
    attention gain IQ·JK·|score| (reference: rectified_spaattn/gapr_mask.py:4-42).

    Args:
      q_blocks: [B,H,NQ,IQ,D] raw per-block queries.
      k_blocks: [B,H,NK,JK,D] raw per-block keys (visual only).
      q_pools:  [B,H,NQ,D] block means of q_blocks.
      k_pools:  [B,H,NK,D] block means of k_blocks.
      scores_unscaled: [B,H,NQ,NK] pooled q·k scores WITHOUT sm_scale.

    Returns:
      bool [B,H,NQ,NK] — True where the pooled correction is NOT
      trustworthy (the reference's `nogapr_mask`); such blocks are folded
      into the critical set for rectification purposes.
    """
    k_pools = k_pools.astype(jnp.float32)
    dk = block_abs_dev(k_blocks, k_pools)
    return gapr_from_stats(q_blocks, q_pools, k_pools, dk, scores_unscaled,
                           jk=k_blocks.shape[-2])


def block_abs_dev(blocks: jax.Array, pools: jax.Array) -> jax.Array:
    """Mean |block − pool| deviation per block: [..., N, J, D] → [..., N, D]
    in fp32 (the k-side GAPR statistic — q-independent, so the plan build
    computes it ONCE per call, optionally tiled over key blocks)."""
    return jnp.mean(jnp.abs(blocks.astype(jnp.float32) - pools[..., None, :]),
                    axis=-2)


def gapr_from_stats(q_blocks: jax.Array, q_pools: jax.Array,
                    k_pools: jax.Array, dk: jax.Array,
                    scores_unscaled: jax.Array, jk: int) -> jax.Array:
    """GAPR from precomputed k-side stats (``k_pools``/``dk`` fp32
    [B,H,NK,D], ``jk`` = tokens per key block).  Splitting the k side out
    lets the row-chunked plan build share one bounded-memory computation
    of the key statistics across all query tiles instead of converting
    the full-length K to fp32 per call (the 345k-token OOM's largest
    allocation)."""
    iq = q_blocks.shape[-2]
    q_pools = q_pools.astype(jnp.float32)
    dq = block_abs_dev(q_blocks, q_pools)                      # [B,H,NQ,D]

    err_q = jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", dq, k_pools)) * (iq * jk)
    err_k = jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", q_pools, dk)) * (iq * jk)
    gain = (iq * jk) * jnp.abs(scores_unscaled)
    return ~(gain > (err_q + err_k))


def ipar_reallocate(probs: jax.Array, num_visual: int, block_n: int) -> jax.Array:
    """IPAR — implicit full-attention reallocation (joint layout).

    The pooled softmax treats a 128-token visual block and a single text
    token as equal mass; token-level full attention would weight a visual
    block ~block_n× higher.  Renormalise so the probabilities estimate what
    full attention would actually allocate, aggregating text into one tail
    column (reference: rectified_hunyuan_attn.py:216-223).

    probs: [B,H,NQ,NK] pooled softmax with NK = num_visual + text tokens.
    Returns [B,H,NQ,num_visual+1].
    """
    visual = probs[..., :num_visual]
    visual_sum = jnp.sum(visual, axis=-1, keepdims=True)
    text_sum = jnp.sum(probs[..., num_visual:], axis=-1, keepdims=True)
    denom = visual_sum * block_n + text_sum
    return jnp.concatenate(
        [visual * block_n / denom, text_sum / denom], axis=-1)


def topp_topk_counts(probs: jax.Array, p_remain: float, top_k_floor: int):
    """Per-row block budget: blocks sorted by probability are kept until the
    cumulative mass passes ``p_remain``, with a floor of ``top_k_floor``
    (reference: rectified_hunyuan_attn.py:226-235).

    Returns (counts [..., ] int32, order [..., NK] int32 descending-prob
    column indices).
    """
    neg = -probs
    order = jnp.argsort(neg, axis=-1)                      # descending probs
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    csum = jnp.cumsum(sorted_probs, axis=-1)
    counts = jnp.sum(csum <= p_remain, axis=-1).astype(jnp.int32) + 1
    counts = jnp.maximum(counts, jnp.int32(top_k_floor))
    return counts, order


def topp_threshold_onehot(probs: jax.Array, p_remain: float,
                          top_k_floor: int) -> jax.Array:
    """Top-p/top-k selection via a per-row probability threshold.

    Equivalent to (topp_topk_counts + counts_to_onehot) except that
    exactly-tied probabilities at the cut are ALL kept — and 4.5x faster
    on TPU: one value sort instead of an argsort plus its inverse
    (argsort of the payload costs ~2.3x a value sort, and the inverse
    permutation another argsort).  Downstream counts are derived from the
    mask itself (mask_to_indices), so tie-overcounts stay self-consistent.
    """
    nk = probs.shape[-1]
    sorted_desc = jnp.sort(probs, axis=-1)[..., ::-1]
    csum = jnp.cumsum(sorted_desc, axis=-1)
    counts = jnp.sum(csum <= p_remain, axis=-1).astype(jnp.int32) + 1
    counts = jnp.clip(counts, jnp.int32(max(top_k_floor, 1)), jnp.int32(nk))
    thresh = jnp.take_along_axis(sorted_desc, (counts - 1)[..., None],
                                 axis=-1)
    return probs >= thresh


def topp_threshold_onehot_bisect(probs: jax.Array, p_remain: float,
                                 top_k_floor: int,
                                 iters: int = 32) -> jax.Array:
    """Sort-free top-p/top-k selection via threshold bisection.

    Selects the same set as :func:`topp_threshold_onehot` — keep =
    probs >= t* where t* = min(t_p, t_k), t_p the top-p cut value and t_k
    the top_k_floor-th largest — but finds t* by bisecting the probability
    range instead of sorting: both "cumulative mass of {p >= t} exceeds
    p_remain" and "count of {p >= t} >= floor" are decreasing in t, so
    their AND bisects as one predicate.  Bit-pattern halvings separate any
    two distinct fp32 probabilities; exact ties are kept together
    by construction (>=).  Replaces the plan build's dominant cost (the
    [B,H,NQ,NK] value sort) with cheap masked reductions.
    """
    nk = probs.shape[-1]
    if p_remain >= 1.0:
        # total mass never exceeds the threshold -> keep every block
        # (matches the sort version's counts = nk clip)
        return jnp.ones(probs.shape, bool)
    floor = jnp.float32(max(top_k_floor, 1))
    pf = probs.astype(jnp.float32)
    # bisect on the fp32 BIT PATTERN: non-negative float bits are order-
    # isomorphic to their values, so 30 halvings resolve to ADJACENT
    # floats across all magnitudes (linear bisection cannot separate the
    # tiny tail probabilities of a peaked softmax)
    bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    lo = bits(jnp.maximum(jnp.min(pf, axis=-1, keepdims=True), 0.0))
    hi = bits(jnp.max(pf, axis=-1, keepdims=True)) + 1

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        t = jax.lax.bitcast_convert_type(mid, jnp.float32)
        ge = pf >= t
        mass = jnp.sum(jnp.where(ge, pf, 0.0), axis=-1, keepdims=True)
        cnt = jnp.sum(ge, axis=-1, keepdims=True).astype(jnp.float32)
        # both predicates are decreasing in t; their AND is true exactly
        # for t <= min(t_p, t_k) — the combined keep threshold
        ok = (mass > p_remain) & (cnt >= floor)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    t_final = jax.lax.bitcast_convert_type(lo, jnp.float32)
    return pf >= t_final


def counts_to_onehot(counts: jax.Array, order: jax.Array) -> jax.Array:
    """Scatter the first ``counts`` columns of each row's descending order
    into a boolean mask — the static-shape equivalent of the reference's
    advanced-indexing scatter (rectified_hunyuan_attn.py:237-262).

    Implemented scatter-free: a column is selected iff its rank in the
    descending sort is below the row's count.
    """
    rank = jnp.argsort(order, axis=-1)                     # inverse permutation
    return rank < counts[..., None].astype(rank.dtype)


def mask_to_indices(mask: jax.Array):
    """Compact a [..., NB] boolean mask into (indices [..., NB] int32,
    counts [...] int32): the first ``counts`` entries of ``indices`` are the
    True columns in ascending order; the rest repeat the LAST valid index so
    a kernel reading past ``counts`` revisits an already-resident block
    (keeps the Pallas pipeline from issuing fresh DMAs for dead slots).
    """
    nb = mask.shape[-1]
    counts = jnp.sum(mask, axis=-1).astype(jnp.int32)
    col = jnp.arange(nb, dtype=jnp.int32)
    # stable sort: valid columns first, each group in ascending column order
    key = jnp.where(mask, col, col + nb)
    indices = jnp.sort(key, axis=-1).astype(jnp.int32)
    last_valid = jnp.take_along_axis(
        indices, jnp.maximum(counts - 1, 0)[..., None].astype(jnp.int32), axis=-1)
    slot = col[(None,) * (mask.ndim - 1)]
    indices = jnp.where(slot < counts[..., None], indices, last_valid)
    # rows with zero selected blocks would otherwise point at column nb
    # (out of range → the kernel prologue would DMA past the array)
    return jnp.minimum(indices, nb - 1), counts


def ff_force_mask(row_idx: jax.Array, n_cols: int, ffb: int) -> jax.Array:
    """First-frame force-include mask (Wan retention, reference:
    rectified_wan21_attn.py:270-271): True where q-block row < ffb AND
    k-block col < ffb.  ``row_idx`` are the rows' GLOBAL block indices
    (shifted under sequence sharding).  Shared by the single-device plan
    and both ring layouts so the executed-mask == planned-mask invariant
    cannot drift between them.  Returns [len(row_idx), n_cols] bool."""
    col = jnp.arange(n_cols)
    return (row_idx[:, None] < ffb) & (col[None, :] < ffb)


def group_rows(mask: jax.Array, group: int, clean_blocks: int = 0):
    """Group ``group`` adjacent query-block rows for the
    G-rows-per-program kernel.

    Adjacent Gilbert-curve query blocks select highly overlapping key sets
    (shared 26-neighborhoods, forced text columns, correlated top-p
    picks): the union of 2 adjacent rows is only ~1.15x a single row's set
    on model-statistics masks (scripts/exp_runstats.py::union_growth), so
    fetching the union once divides the byte-bound kernel's HBM traffic by
    ~group/union_growth.

    Union slots are PARTITIONED [clean | tail], each part ascending, where
    clean = selected by ALL group rows ∧ block < ``clean_blocks`` (the
    fully-valid visual prefix): the kernel's leading chunks then need no
    masking at all.

    mask: [B, H, NQ, NB] bool (NQ % group == 0).
    Returns (indices [B,H,NQ/G,NB], counts [B,H,NQ/G], rowbits
    [B,H,NQ/G,NB] int32, clean [B,H,NQ/G] int32) where rowbits bit r says
    whether the gathered block belongs to row r's planned set
    (r = 0..group-1 within the group) and ``clean`` is the length of the
    mask-free slot prefix.
    """
    b, h, nq, nb = mask.shape
    assert nq % group == 0, (nq, group)
    # membership bits are PACKED into the sort key's low bits (one sort,
    # no [.., NB] gather — the round-4 full-path attribution measured the
    # take_along_axis rowbits gather as the cost that erased the grouped
    # kernel's win); the packed key needs group + log2(4*nb) bits
    assert 1 <= group <= 8, group
    # key-width precondition: catcol reaches ~4*nb and shifts left by
    # ``group`` bits — int32 overflows once nb exceeds that budget
    # (~2^21 blocks at group=8; far past current scales, but fail loudly)
    if nb >= (1 << (31 - group)) // 4:
        raise ValueError(
            f"group_rows={group} packed sort key overflows int32 at "
            f"nb={nb} (needs nb < {(1 << (31 - group)) // 4})")
    mg = mask.reshape(b, h, nq // group, group, nb)
    union = jnp.any(mg, axis=-2)
    allm = jnp.all(mg, axis=-2)
    col = jnp.arange(nb, dtype=jnp.int32)
    clean_col = union & allm & (col < clean_blocks)
    counts = jnp.sum(union, axis=-1).astype(jnp.int32)
    clean = jnp.sum(clean_col, axis=-1).astype(jnp.int32)
    weights = (1 << jnp.arange(group, dtype=jnp.int32))[:, None]
    bits = jnp.sum(mg.astype(jnp.int32) * weights, axis=-2)
    # packed sort key: [category*nb + col | bits].  category: clean
    # ascending, then dirty-selected ascending, then unselected; the
    # category-column prefix is unique per column, so the order equals
    # the unpacked sort's and the low bits ride along for free.
    catcol = jnp.where(clean_col, col,
                       jnp.where(union, col + nb, col + 3 * nb))
    skey = jnp.sort((catcol << group) | bits, axis=-1)
    indices = ((skey >> group) % nb).astype(jnp.int32)
    rowbits = (skey & ((1 << group) - 1)).astype(jnp.int32)
    # padding slots repeat the last valid block (kernel DMA safety; their
    # scores are masked by slot < count, so rowbits there are dead)
    last_valid = jnp.take_along_axis(
        indices, jnp.maximum(counts - 1, 0)[..., None].astype(jnp.int32),
        axis=-1)
    slot = col[(None,) * 3]
    indices = jnp.where(slot < counts[..., None], indices, last_valid)
    return indices, counts, rowbits, clean


def pair_rows(mask: jax.Array, clean_blocks: int = 0):
    """group_rows with group=2 (the round-1 name)."""
    return group_rows(mask, 2, clean_blocks)


def quantize_kv_blocks(k: jax.Array, v: jax.Array, block: int):
    """Per-(head, key-block) absmax int8 quantization of the lane-packed
    KV stream — halves the gather kernel's HBM bytes (it is byte-bound:
    the DMA skeleton runs at 78 % of bandwidth, RESULTS_r2.md).

    k/v: [B, H, S, D] (invalid tokens already zeroed).  Returns
    (kv_int8 [B*H, S, 2D], scale_k [B,H,NB], scale_v [B,H,NB]) with
    x ≈ int8 * scale / 127; per-element noise ~0.4 % averages down by
    ~1/sqrt(D) in the scores.
    """
    b, h, s, d = k.shape
    nb = s // block
    assert s % block == 0, (s, block)

    def quant(x):
        xb = x.astype(jnp.float32).reshape(b, h, nb, block, d)
        scale = jnp.max(jnp.abs(xb), axis=(-2, -1))          # [B,H,NB]
        denom = jnp.where(scale == 0.0, 1.0, scale)
        q = jnp.round(xb * (127.0 / denom[..., None, None]))
        q = jnp.clip(q, -127, 127).astype(jnp.int8)
        return q.reshape(b, h, s, d), scale / 127.0

    kq, sk = quant(k)
    vq, sv = quant(v)
    kv = jnp.concatenate([kq.reshape(b * h, s, d),
                          vq.reshape(b * h, s, d)], axis=2)
    return kv, sk, sv


def rectification(probs: jax.Array, partial_mask: jax.Array,
                  value_pool: jax.Array):
    """Rectification factors for the sparse output.

    R (critical mass): total implicit-full-attention probability captured by
    the partial set (selected ∪ GAPR-untrusted); the sparse kernel's
    normalised output is scaled by R.  Non-critical compensation: pooled
    probability of trusted-but-unselected blocks times their pooled value
    (reference: rectified_hunyuan_attn.py:347-357).

    Args:
      probs: [B,H,NQ,NP] implicit-full-attention probabilities.
      partial_mask: [B,H,NQ,NP] bool.
      value_pool: [B,H,NP,D] pooled values (fp32).

    Returns (R [B,H,NQ] fp32, comp [B,H,NQ,D] fp32) at BLOCK granularity;
    callers broadcast to tokens (the reference repeat_interleaves here —
    we defer that to keep the arrays 128× smaller).
    """
    kept = jnp.where(partial_mask, probs, 0.0)
    r = jnp.sum(kept, axis=-1)
    dropped = jnp.where(partial_mask, 0.0, probs)
    comp = jnp.einsum("bhqk,bhkd->bhqd", dropped, value_pool,
                      preferred_element_type=jnp.float32)
    return r, comp

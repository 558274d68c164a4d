"""Dense attention dispatch — the TPU analogue of the reference's
``fullattn`` mode switch (reference: rectified_spaattn/attn.py:60-154).

Modes:
  "flash"   — Pallas TPU flash attention (stock JAX kernel) with key
              validity expressed as segment ids; falls back to "vanilla"
              off-TPU so tests run on CPU.
  "vanilla" — explicit jnp softmax attention, the numerical oracle
              (reference: attn.py:121-149).

The reference's "torch" mode (SDPA) collapses into "flash" here: XLA/Pallas
is the only backend.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _vanilla_attention(q, k, v, kv_valid=None, sm_scale=None):
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
    if kv_valid is not None:
        scores = jnp.where(kv_valid[:, None, None, :], scores, MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _pick_block(n: int, target: int) -> int:
    """Largest multiple-of-128 block size <= target that divides n."""
    best = 128
    cand = 128
    while cand <= min(n, target):
        if n % cand == 0:
            best = cand
        cand *= 2
    return best


@functools.partial(jax.jit, static_argnames=("mode", "sm_scale"))
def dense_attention(
    q: jax.Array,              # [B, H, Sq, D]
    k: jax.Array,              # [B, H, S,  D]
    v: jax.Array,              # [B, H, S,  D]
    kv_valid: jax.Array | None = None,   # [B, S] bool
    *,
    mode: str = "flash",
    sm_scale: float | None = None,
) -> jax.Array:
    """Exact attention of every query over all (valid) keys."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    on_tpu = jax.devices()[0].platform == "tpu"
    if mode == "vanilla" or (mode in ("flash", "torch") and not on_tpu):
        return _vanilla_attention(q, k, v, kv_valid, sm_scale)
    if mode not in ("flash", "torch"):
        raise ValueError(f"unknown dense attention mode: {mode!r}")

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes, SegmentIds)

    b, h, sq, d = q.shape
    s = k.shape[2]
    # The stock TPU flash kernel requires 128-divisible sequence lengths;
    # pad queries (sliced off below) and keys (masked off via segment
    # ids) — e.g. Wan-I2V's 257-token CLIP image cross-attention.
    pad_q = (-sq) % 128
    pad_kv = (-s) % 128
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_kv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        if kv_valid is None:
            kv_valid = jnp.arange(s + pad_kv)[None, :] < s
            kv_valid = jnp.broadcast_to(kv_valid, (b, s + pad_kv))
        else:
            kv_valid = jnp.pad(kv_valid, ((0, 0), (0, pad_kv)))
    sq_p, s_p = sq + pad_q, s + pad_kv
    segment_ids = None
    if kv_valid is not None:
        # Valid keys share segment 1 with every query; invalid keys get 0.
        q_seg = jnp.ones((b, sq_p), jnp.int32)
        kv_seg = kv_valid.astype(jnp.int32)
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)
    block_sizes = BlockSizes(
        block_q=_pick_block(sq_p, 512),
        block_k_major=_pick_block(s_p, 512),
        block_k=_pick_block(s_p, 512),
        block_b=1,
    )
    out = flash_attention(q, k, v, segment_ids=segment_ids,
                          sm_scale=sm_scale, block_sizes=block_sizes)
    return out[:, :, :sq] if pad_q else out

"""Attention mode dispatch — TPU analogue of the reference's per-processor
``mode ∈ {sparse, flash, torch, vanilla}`` switch
(reference: rectified_hunyuan_attn.py:506-524, attn.py:60-154).

"torch" (SDPA) is accepted as an alias of "flash": XLA/Pallas is the only
backend on TPU.  Dense modes are the built-in A/B oracle for the sparse
path (SURVEY §4.2).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

import jax.numpy as jnp

from ..sparse import SparseConfig
from ..kernels import dense_attention, block_sparse_flash_attention
from .rectified import rectified_sparse_attention, kv_validity

DENSE_MODES = ("flash", "torch", "vanilla")


def _windowed_dense_flash(q, k, v, *, visual_len, text_start, tlen,
                          block: int = 128, block_m: Optional[int] = None,
                          interpret: bool = False, kv_packed=None):
    """Exact attention with [visual | pad | text | pad] key validity via
    the gather kernel with full index lists — the stock segment-ids flash
    path materialises poorly at video scale on this toolchain.

    ``kv_packed``: the caller already holds KV packed as [B,H,S,2D]
    (same contract as attention/rectified.py) — skips the kernel-side
    packed copy, the long-context memory saver that lets the dense
    denominator fit next to q at 345k+ tokens (k/v must then be the
    matching slices and the sequence must be block-aligned)."""
    b, h, s_orig, d = q.shape
    s = s_orig
    pad = (-s) % block
    if pad:
        assert kv_packed is None, (
            "kv_packed requires a block-aligned sequence")
        z = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v = z(q), z(k), z(v)
        s += pad
    nb = s // block
    # Every row shares the full index list, so the q tile can span several
    # mask rows — wide KV reuse makes the dense fallback compute-bound.
    # The kernel allows Sq != Skv, so q is padded up to the tile width
    # independently of KV (wasted rows are sliced off); the 115k-token
    # sweep (scripts/bench_dense.py) measures 1024 > 512 > 256
    # (134/129/122 TF/s) — wider tiles amortise more KV traffic.  Capped
    # at the sequence so tiny shapes don't compute mostly padding.
    # RSA_DENSE_BM overrides the tile width (widths that DIVIDE the
    # sequence also skip the padded-q copy); measured 1024/512/256 =
    # 134/129/122 TF/s at 115k tokens — see scripts/bench_dense.py.
    bm = block_m or int(os.environ.get("RSA_DENSE_BM", 0)) or max(
        m for m in (1024, 512, 256, 128) if m <= s or m == 128)
    qpad = (-s) % bm
    if qpad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, qpad), (0, 0)))
    nq = (s + qpad) // bm
    idx = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), (b, h, nq, nb))
    counts = jnp.full((b, h, nq), nb, jnp.int32)
    out = block_sparse_flash_attention(
        q, k, v, idx, counts, tlen, visual_len=visual_len,
        text_start=text_start, block_m=bm, block_n=block,
        interpret=interpret, packed_kv=kv_packed)
    return out[:, :, :s_orig] if (pad or qpad) else out


def attention(
    q: jax.Array,                 # [B, H, S, D]
    k: jax.Array,
    v: jax.Array,
    mode: str = "sparse",
    *,
    cfg: Optional[SparseConfig] = None,
    neighbor_mask: Optional[jax.Array] = None,
    visual_len: Optional[int] = None,
    text_len_rt: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Unified attention entry point for model layers; returns [B,H,S,D]."""
    if mode == "sparse":
        assert cfg is not None and visual_len is not None
        return rectified_sparse_attention(
            q, k, v, cfg, neighbor_mask, visual_len=visual_len,
            text_len_rt=text_len_rt, interpret=interpret)
    if mode in DENSE_MODES:
        hc = cfg.head_chunk if cfg is not None else 0
        if hc and 0 < hc < q.shape[1]:
            # Head-tiled dense execution — the same peak-HBM lever as
            # the sparse path's head_chunk (rectified.py::_head_chunked):
            # the windowed gather is per-head independent, so tiling
            # divides its q/kv/out temporaries at identical math.  Keeps
            # the dense denominator runnable next to trees that leave no
            # full-head headroom (16.4B Wan2.1-I2V at full depth).
            import dataclasses
            b, h, s, d = q.shape
            if h % hc:
                raise ValueError(f"head_chunk ({hc}) must divide the "
                                 f"head count ({h})")
            sub = dataclasses.replace(cfg, head_chunk=0)

            def body(i, buf):
                sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * hc, hc, 1)
                o = attention(sl(q), sl(k), sl(v), mode, cfg=sub,
                              neighbor_mask=neighbor_mask,
                              visual_len=visual_len,
                              text_len_rt=text_len_rt, interpret=interpret)
                return jax.lax.dynamic_update_slice_in_dim(buf, o, i * hc,
                                                           axis=1)
            return jax.lax.fori_loop(0, h // hc, body,
                                     jnp.zeros(q.shape, q.dtype))
        b, _, s, _ = q.shape
        text_start = None
        tlen = jnp.zeros((b,), jnp.int32)
        if cfg is not None and cfg.layout == "joint" and visual_len is not None:
            text_start = s - cfg.text_len
            tlen = (text_len_rt.astype(jnp.int32) if text_len_rt is not None
                    else jnp.full((b,), cfg.text_len, jnp.int32))
        if mode == "vanilla" or interpret:
            valid = None
            if visual_len is not None:
                valid = kv_validity(b, s, visual_len, text_start,
                                    tlen if text_start is not None else None,
                                    cfg.text_len if cfg else 0)
            return dense_attention(q, k, v, valid, mode="vanilla")
        if visual_len is None:
            return dense_attention(q, k, v, None, mode="flash")
        return _windowed_dense_flash(q, k, v, visual_len=visual_len,
                                     text_start=text_start, tlen=tlen)
    raise ValueError(f"unknown attention mode: {mode!r}")

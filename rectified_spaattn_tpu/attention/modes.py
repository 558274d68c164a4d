"""Attention mode dispatch — TPU analogue of the reference's per-processor
``mode ∈ {sparse, flash, torch, vanilla}`` switch
(reference: rectified_hunyuan_attn.py:506-524, attn.py:60-154).

"torch" (SDPA) is accepted as an alias of "flash": XLA/Pallas is the only
backend on TPU.  Dense modes are the built-in A/B oracle for the sparse
path (SURVEY §4.2).
"""

from __future__ import annotations

from typing import Optional

import jax

from ..sparse import SparseConfig
from ..kernels import dense_attention
from .rectified import rectified_sparse_attention, kv_validity

DENSE_MODES = ("flash", "torch", "vanilla")


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
        valid = None
        if visual_len is not None:
            b, _, s, _ = q.shape
            if cfg is not None and cfg.layout == "joint":
                text_start = s - cfg.text_len
                valid = kv_validity(b, s, visual_len, text_start,
                                    text_len_rt, cfg.text_len)
            else:
                valid = kv_validity(b, s, visual_len, None, None)
        dense_mode = "vanilla" if (mode == "vanilla" or interpret) else "flash"
        return dense_attention(q, k, v, valid, mode=dense_mode)
    raise ValueError(f"unknown attention mode: {mode!r}")

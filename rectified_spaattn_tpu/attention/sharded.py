"""Multi-chip sharded rectified sparse attention.

The sparse mask is built PER HEAD (reference semantics), so head
parallelism is collective-free for the entire pipeline — mask build,
kernel, rectification all act on disjoint head shards.  This wraps
``rectified_sparse_attention`` in a ``shard_map`` over the mesh's tp axis:
each device runs the full single-chip path on its heads.

Batch (dp) sharding composes for free (leading-axis split).  Sequence
parallelism (sp) is implemented in attention/ring.py: ring-rotated KV
shards with exact online-softmax merging via the kernel's return_stats.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..sparse import SparseConfig
from .rectified import rectified_sparse_attention


def head_parallel_rectified_attention(
    mesh: Mesh,
    q: jax.Array,                 # [B, H, S, D]
    k: jax.Array,
    v: jax.Array,
    cfg: SparseConfig,
    neighbor_mask: Optional[jax.Array] = None,
    *,
    visual_len: int,
    text_len_rt: Optional[jax.Array] = None,
    head_axis: str = "tp",
    batch_axis: Optional[str] = "dp",
    interpret: bool = False,
) -> jax.Array:
    """Run rectified sparse attention with heads sharded over ``head_axis``
    (and optionally batch over ``batch_axis``).  Zero collectives inside —
    XLA only partitions the data."""
    tp = mesh.shape[head_axis]
    if q.shape[1] % tp:
        raise ValueError(
            f"head-parallel sparse attention needs heads % tp == 0, got "
            f"{q.shape[1]} heads over tp={tp} (pick --tp dividing the "
            f"model's head count)")
    bspec = batch_axis if batch_axis in mesh.axis_names else None
    qkv_spec = P(bspec, head_axis, None, None)
    nb_spec = P(None, None)
    tl_spec = P(bspec)

    def local(qs, ks, vs, nb, tl):
        return rectified_sparse_attention(
            qs, ks, vs, cfg, nb, visual_len=visual_len,
            text_len_rt=tl, interpret=interpret)

    in_specs = [qkv_spec, qkv_spec, qkv_spec, nb_spec, tl_spec]
    if neighbor_mask is None:
        def local_no_nb(qs, ks, vs, tl):
            return rectified_sparse_attention(
                qs, ks, vs, cfg, None, visual_len=visual_len,
                text_len_rt=tl, interpret=interpret)
        fn = shard_map(local_no_nb, mesh=mesh,
                       in_specs=(qkv_spec, qkv_spec, qkv_spec, tl_spec),
                       out_specs=qkv_spec, check_vma=False)
        args = (q, k, v)
    else:
        fn = shard_map(local, mesh=mesh,
                       in_specs=tuple(in_specs), out_specs=qkv_spec,
                       check_vma=False)
        args = (q, k, v, neighbor_mask)
    default_tl = cfg.text_len if cfg.layout == "joint" else 0
    tl = (text_len_rt.astype(jnp.int32) if text_len_rt is not None
          else jnp.full((q.shape[0],), default_tl, jnp.int32))
    return fn(*args, tl)

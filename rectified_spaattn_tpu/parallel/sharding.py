"""Sharding plans for the DiT forward pass.

Strategy (free to design — the reference has no distributed semantics to
match, SURVEY §2.6):

  * dp — batch / CFG-branch sharding: embarrassingly parallel.
  * tp — hidden/head sharding: every Dense that produces per-head features
    is sharded on its output dim, every Dense that consumes them on its
    input dim, so attention heads are local and the only collective is the
    psum XLA inserts after row-sharded projections.  The sparse mask is
    per-head, so head-parallel sharding keeps the whole mask pipeline
    local too.
  * sp — sequence sharding for the (huge) token axis of activations
    between attention sites; XLA all-gathers around attention.

Plans are expressed as NamedSharding pytrees over flax param dicts and
input batches; jit + XLA propagation does the rest.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Param-name patterns (flax path suffixes) that are column-sharded
# (output features split over tp) vs row-sharded (input features split).
_COL_PAT = re.compile(
    r"(to_q|to_k|to_v|add_q|add_k|add_v|to_qkv|qkv|fc1|proj_mlp|linear)"
)
_ROW_PAT = re.compile(r"(to_out|to_add_out|proj|fc2|attn1_to_out|attn2_to_out)")


def _spec_for(path: tuple, leaf, tp: int, int4_sibling: bool) -> P:
    """Partition spec for one param leaf.

    Rank-agnostic: specs target the TRAILING feature axes, so stacked
    [L, in, out] leaves from models/scan.py::stack_block_params shard
    exactly like their unrolled [in, out] counterparts (the scan axis L
    stays replicated — lax.scan slices it per iteration).  Quantized
    layouts (models/quant.py) ride the same rules: kernel_q / kernel_q4
    shard like kernel; int4 per-group scales [..., G, out] follow their
    kernel's role (G tracks the input axis); int8 row-layer scales
    [..., out] stay replicated.  Any axis tp doesn't divide falls back
    to replicated — annotations are GSPMD hints, correctness never
    depends on them.
    """
    name = "/".join(str(p) for p in path)
    lname = str(path[-1]) if path else ""
    if leaf.ndim < 2:
        return P()
    role = ("row" if _ROW_PAT.search(name)
            else "col" if _COL_PAT.search(name) else None)
    if role is None:
        return P()
    col = (P(*([None] * (leaf.ndim - 1)), "tp")
           if leaf.shape[-1] % tp == 0 else P())
    row = (P(*([None] * (leaf.ndim - 2)), "tp", None)
           if leaf.shape[-2] % tp == 0 else P())
    if lname in ("kernel", "kernel_q", "kernel_q4"):
        return col if role == "col" else row
    if lname == "kernel_scale":
        if role == "col":
            return col
        return row if int4_sibling else P()
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding tree for a flax param dict: qkv-style kernels column-
    sharded, output projections row-sharded, everything else replicated.
    Handles plain, stacked (scan), and weight-only-quantized trees."""
    tp = int(mesh.shape.get("tp", 1))
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    q4_parents = {path[:-1] for path, _ in flat
                  if getattr(path[-1], "key", None) == "kernel_q4"}

    def to_spec(path, leaf):
        keys = tuple(getattr(p, "key", getattr(p, "idx", str(p)))
                     for p in path)
        return NamedSharding(
            mesh, _spec_for(keys, leaf, tp, path[:-1] in q4_parents))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    specs = [to_spec(p, l) for p, l in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def activation_sharding(mesh: Mesh, *, batch_axis: int = 0,
                        seq_axis: int | None = None, ndim: int = 3
                        ) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = "dp"
    if seq_axis is not None:
        spec[seq_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def shard_params(mesh: Mesh, params: Any):
    """Place a param tree on the mesh according to param_shardings."""
    sh = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)

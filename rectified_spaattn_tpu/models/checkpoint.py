"""Param-tree checkpointing (orbax).

The reference never saves anything (inference-only, weights are read-only
HF snapshots, SURVEY §5).  Here converted safetensors→flax param trees can
be saved once and memory-mapped back quickly — the convert step reads the
whole torch state dict, so caching the converted tree makes pipeline
startup ~free on subsequent runs.
"""

from __future__ import annotations

import os
from typing import Any


def save_params(params: Any, path: str):
    """Write a param pytree to ``path`` (directory) via orbax."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, params)
    return path


def load_params(path: str) -> Any:
    """Read a param pytree saved by save_params."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def convert_and_cache(family: str, snapshot_dir: str, cache_dir: str,
                      **convert_kwargs) -> Any:
    """Load converted params from ``cache_dir`` if present; otherwise run
    the safetensors converter for ``family`` and cache the result."""
    from .weights import convert_strict, load_safetensors_dir
    if os.path.isdir(cache_dir) and os.listdir(cache_dir):
        return load_params(cache_dir)
    sd = load_safetensors_dir(snapshot_dir)
    params = convert_strict(family, sd, **convert_kwargs)
    save_params(params, cache_dir)
    return params

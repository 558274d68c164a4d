"""Prompt-level data parallelism for batch evaluation.

The reference's multi-GPU eval is ``ProcessPoolExecutor`` over
``prompt_list[i::num_gpus]`` with one pipeline per process
(reference: eval/video/experiments/multigpu_hunyuan.py:287-298).  The TPU
equivalent keeps the same sharding contract but maps shards to hosts
(multi-host pods) or to dp mesh slices on one host.
"""

from __future__ import annotations

from typing import Sequence

import jax


def shard_prompts(prompts: Sequence, shard_index: int | None = None,
                  num_shards: int | None = None) -> list:
    """Round-robin prompt shard for this worker
    (same interleaving as the reference: prompt_list[i::num_gpus])."""
    if shard_index is None:
        shard_index = jax.process_index()
    if num_shards is None:
        num_shards = jax.process_count()
    return list(prompts)[shard_index::num_shards]

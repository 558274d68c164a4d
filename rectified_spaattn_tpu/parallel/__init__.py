from .mesh import make_mesh, replicated, batch_sharding
from .sharding import param_shardings, activation_sharding, shard_params
from .multihost import shard_prompts

__all__ = [
    "make_mesh", "replicated", "batch_sharding",
    "param_shardings", "activation_sharding", "shard_params",
    "shard_prompts",
]

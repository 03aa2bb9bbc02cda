from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    shard_params,
    expert_sharding_rules,
)

__all__ = [
    "make_mesh", "data_sharding", "replicated", "shard_batch",
    "shard_params", "expert_sharding_rules",
]

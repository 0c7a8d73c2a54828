from .mesh import (auto_mesh, make_mesh, param_sharding_rules, shard_batch,
                   shard_params, shard_state)

__all__ = ["auto_mesh", "make_mesh", "param_sharding_rules", "shard_batch",
           "shard_params", "shard_state"]

from .mesh import (auto_mesh, find_free_port, get_dist_info, make_mesh,
                   param_sharding_rules, shard_batch, shard_params,
                   shard_state)

__all__ = ["auto_mesh", "find_free_port", "get_dist_info", "make_mesh",
           "param_sharding_rules", "shard_batch", "shard_params",
           "shard_state"]

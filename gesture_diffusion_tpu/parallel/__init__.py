from .mesh import (make_mesh, shard_batch, replicate, data_sharding,
                   init_distributed)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "init_distributed"]

from .mesh import (batch_sharding, make_mesh, pad_batch_rows, replicated,
                   shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "pad_batch_rows"]

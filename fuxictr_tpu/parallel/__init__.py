from fuxictr_tpu.parallel.mesh import (batch_sharding, batch_spec, make_mesh,
                                       param_sharding, replicated, shard_batch,
                                       shard_params)

__all__ = ["make_mesh", "replicated", "batch_spec", "batch_sharding",
           "shard_batch", "param_sharding", "shard_params"]

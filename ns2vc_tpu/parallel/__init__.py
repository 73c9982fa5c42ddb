from ns2vc_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "param_shardings", "shard_batch"]

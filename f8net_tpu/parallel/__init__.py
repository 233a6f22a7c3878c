from .mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    param_shardings,
    int_param_shardings,
    shard_batch,
)

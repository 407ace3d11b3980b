from pointseg.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_state,
    shard_state_tp,
    tensor_parallel_sharding,
)

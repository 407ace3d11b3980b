from pointseg.parallel.mesh import (  # noqa: F401
    create_hybrid_mesh,
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_state,
    shard_state_tp,
    sharded_param_fraction,
    tensor_parallel_sharding,
)

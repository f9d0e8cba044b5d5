from vgd_tpu.parallel.mesh import (
    build_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_tree_replicated,
    DATA_AXIS,
    MODEL_AXIS,
)

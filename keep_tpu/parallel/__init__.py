from keep_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)

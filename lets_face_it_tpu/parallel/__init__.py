from lets_face_it_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch,
    replicate,
    replicated,
    shard_batch,
)

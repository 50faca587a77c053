from .mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
    assemble_global_batch, agree_global_shape, host_device_count,
)

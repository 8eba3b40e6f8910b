from vcoder_tpu.parallel.mesh import (
    AXES,
    current_mesh,
    make_mesh,
    single_device_mesh,
    use_mesh,
)
from vcoder_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "AXES",
    "current_mesh",
    "make_mesh",
    "single_device_mesh",
    "use_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_batch",
    "shard_params",
]

from aum_tpu.parallel.mesh import (
    make_mesh,
    param_partition_specs,
    shard_params,
)

__all__ = ["make_mesh", "param_partition_specs", "shard_params"]

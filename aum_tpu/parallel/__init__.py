from aum_tpu.parallel.mesh import (
    make_mesh,
    param_partition_specs,
    shard_params,
)
from aum_tpu.parallel.pipeline import block_stage_fn, pipeline_apply

__all__ = ["make_mesh", "param_partition_specs", "shard_params",
           "block_stage_fn", "pipeline_apply"]

from montreal_forced_aligner_tpu.parallel.mesh import get_mesh, shard_leading_axis
from montreal_forced_aligner_tpu.parallel.data_parallel import (
    make_sharded_accumulate_step,
)

__all__ = ["get_mesh", "shard_leading_axis", "make_sharded_accumulate_step"]

"""Parallelism layer — new capability vs the reference (SURVEY.md §2.8).

The reference is strictly single-process single-device (``trainer.py:153``
carries the "multiple GPUs" TODO). Here: device-mesh helpers, data-parallel
training via GSPMD sharding annotations, and (growing) spatially-sharded
pipeline components.
"""

from pwclonet_pylidarslam_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
)
from pwclonet_pylidarslam_tpu.parallel.data_parallel import (  # noqa: F401
    make_parallel_train_step,
    shard_batch,
    replicate_state,
)
from pwclonet_pylidarslam_tpu.parallel.sharded_icp import (  # noqa: F401
    solve_point_to_plane_sharded,
    solve_point_to_point_sharded,
)
from pwclonet_pylidarslam_tpu.parallel.sharded_map import (  # noqa: F401
    build_voxel_table_sharded,
    voxel_nn_sharded,
)

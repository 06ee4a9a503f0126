"""Data layer: dataset readers (KITTI, KITTI-360, …), synthetic sequences,
window/pair datasets, and host-side prefetching."""

from pwclonet_pylidarslam_tpu.data.synthetic import (  # noqa: F401
    SyntheticSequenceConfig,
    generate_sequence,
)
from pwclonet_pylidarslam_tpu.data.shapes import (  # noqa: F401
    Indoor3DSemSegDataset,
    ModelNet40Dataset,
    SyntheticRooms,
    SyntheticShapes,
)

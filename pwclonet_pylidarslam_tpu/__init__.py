"""TPU-native LiDAR SLAM framework (JAX / XLA / Pallas / pjit).

A ground-up re-design of the capabilities of pyLiDAR-SLAM + PWCLO-Net
(reference: saali14/PWCLONet_pyLiDARSLAM) for TPU hardware:

- ``core``      — SO(3)/SE(3) math, robust Gauss-Newton, spherical projection,
                  voxel grids, rigid registration. Pure JAX, fixed shapes.
- ``ops``       — point-cloud primitives (FPS, kNN, gather/group, 3-NN
                  interpolation, ball query) as fixed-shape XLA ops with
                  Pallas kernels for the hot paths.
- ``models``    — Flax model zoo: PWCLO-Net (set-conv pyramid, attentive cost
                  volume, hierarchical pose warp-refinement) and PoseResNet.
- ``slam``      — the five-slot SLAM pipeline (initialization, preprocessing,
                  odometry, loop closure, backend) around an explicit frame
                  state pytree with a jitted per-frame step.
- ``data``      — KITTI / KITTI-360 / synthetic sequence datasets with
                  host-side prefetching.
- ``train``     — optax/orbax training stack for the deep odometry networks.
- ``evaluation``— KITTI odometry metrics (t_rel, r_rel, ATE, ARE), results
                  aggregation, benchmark tables.
- ``parallel``  — device-mesh utilities, data-parallel training, sharded
                  pose-graph backend (new capability vs the reference).
"""

__version__ = "0.1.0"

"""Benchmark: projective frame-to-model ICP odometry latency per frame.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Headline comparison: the reference's best GPU SLAM configuration
(CV init + Projective F2M ICP) runs at **116.62 ms/frame**
(`docs/results/KITTI/kitti_benchmark.md:12`). We run the same class of
pipeline (constant-velocity init + projective frame-to-model ICP, 20-keyframe
local map, 64×720 vertex maps, 8192-point scans) on whatever accelerator JAX
exposes (TPU under axon; CPU in hermetic runs) and report steady-state
ms/frame. ``vs_baseline`` = reference_time / our_time (>1 = faster than the
reference GPU).

Correctness leg: the run aborts (exit 1) if the produced trajectory drifts
more than 1% over the synthetic sequence — a fast benchmark on a broken
pipeline must not count.
"""

import json
import sys
import time

import numpy as np

REFERENCE_MS_PER_FRAME = 116.620  # ref kitti_benchmark.md:12 (GPU, CV+PF2M)


def main():
    from pwclonet_pylidarslam_tpu.data.synthetic import (
        SyntheticSequenceConfig,
        generate_sequence,
    )
    from pwclonet_pylidarslam_tpu.evaluation import metrics
    from pwclonet_pylidarslam_tpu.slam import ICPConfig, ICPOdometry

    chunk = 32
    n_frames = 2 * chunk
    scans, gt = generate_sequence(
        SyntheticSequenceConfig(n_frames=n_frames, trajectory="curve", speed=1.2, seed=7)
    )

    # tuned streaming config: keyframes stored at angular stride 2 (halves
    # the model re-projection scatter, the dominant device cost), scans
    # shipped as int16 @ 3 mm (halves the host->device bytes — the wall-clock
    # floor on a network-attached chip), and lazy model rebuilds (the cached
    # model map is re-scattered only after 4 m / 5 deg of motion; association
    # runs in the cached frame). All verified against the drift gate.
    odo = ICPOdometry(
        ICPConfig(
            num_points=8192, map_stride=2,
            transfer_dtype="int16", transfer_scale=0.003,
            model_rebuild_trans=4.0, model_rebuild_rot=5.0,
        )
    )
    odo.init()

    # chunks run as ONE device dispatch each (lax.scan over frames) — the
    # TPU-native design keeps the SLAM state resident and avoids per-frame
    # host↔device round trips (which dominate on a network-attached chip)
    odo.process_sequence(scans[:chunk])  # compile + warm state

    t0 = time.perf_counter()
    for start in range(chunk, n_frames, chunk):
        odo.process_sequence(scans[start : start + chunk])
    elapsed = time.perf_counter() - t0
    ms_per_frame = elapsed / (n_frames - chunk) * 1000.0

    # correctness gate
    pred = odo.absolute_poses()
    drift = float(np.linalg.norm(pred[-1][:3, 3] - gt[-1][:3, 3]))
    dist = float(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1).sum())
    rel_err = drift / max(dist, 1e-9)
    if rel_err > 0.01:
        print(
            f"BENCH FAILED correctness: drift {drift:.3f} m over {dist:.1f} m "
            f"({rel_err:.2%})",
            file=sys.stderr,
        )
        sys.exit(1)

    print(
        json.dumps(
            {
                "metric": "icp_odometry_latency",
                "value": round(ms_per_frame, 3),
                "unit": "ms/frame",
                "vs_baseline": round(REFERENCE_MS_PER_FRAME / ms_per_frame, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

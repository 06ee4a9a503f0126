"""Measure voxel-ICP latency/accuracy across the round-5 variants on chip.

Apportions VERDICT r4 item 3: per-frame-rebuild baseline vs lazy rebuild
(voxel_rebuild_every) vs fused one-sort build, plus projective-latency
repeat runs to bound host/tunnel variance (the round-4 6.05 -> 7.50 ms
"regression" was never reconciled).

Usage: python tools/bench_icp_variants.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench
    from pwclonet_pylidarslam_tpu.evaluation import metrics as M
    from pwclonet_pylidarslam_tpu.slam import ICPConfig

    scans, gt = bench.load_kitti_profile()
    results = []

    # projective latency variance: same config, N runs
    proj_cfg = ICPConfig(
        num_points=8192, map_stride=2,
        transfer_dtype="int16", transfer_scale=0.003,
        model_rebuild_trans=4.0, model_rebuild_rot=5.0,
        bev_bootstrap=True,
    )
    proj_ms = []
    for r in range(args.reps):
        poses, ms = bench.run_icp(proj_cfg, scans)
        t_rel, _, _ = M.compute_kitti_metrics(poses, gt[: poses.shape[0]])
        proj_ms.append(round(ms, 3))
        print(f"projective rep {r}: {ms:.3f} ms/frame  t_rel {100*t_rel:.4f}%",
              flush=True)
    results.append({"config": "projective", "ms_per_frame": proj_ms,
                    "t_rel_pct": round(100 * t_rel, 4)})

    voxel_variants = [
        ("voxel R=1 (r4 baseline)", {}),
        ("voxel R=2", {"voxel_rebuild_every": 2}),
        ("voxel R=4", {"voxel_rebuild_every": 4}),
        ("voxel R=4 fused", {"voxel_rebuild_every": 4, "voxel_fused_build": True}),
        ("voxel R=1 fused", {"voxel_fused_build": True}),
    ]
    for name, kw in voxel_variants:
        cfg = ICPConfig(
            num_points=8192, map_stride=2, association="voxel",
            bev_bootstrap=True, transfer_dtype="int16", transfer_scale=0.003,
            **kw,
        )
        t0 = time.perf_counter()
        poses, ms = bench.run_icp(cfg, scans)
        t_rel, _, _ = M.compute_kitti_metrics(poses, gt[: poses.shape[0]])
        print(f"{name}: {ms:.3f} ms/frame  t_rel {100*t_rel:.4f}%  "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
        results.append({"config": name, "kw": kw, "ms_per_frame": round(ms, 3),
                        "t_rel_pct": round(100 * t_rel, 4)})

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"runs": results}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

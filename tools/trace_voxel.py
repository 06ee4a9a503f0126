"""Capture a jax.profiler device trace of the voxel-mode ICP frame and print
per-op totals — the apportionment evidence VERDICT r4 item 3 asks for
(where do the voxel mode's ~36 ms/frame go: table build sorts, candidate
gathers, GN solve, or something else).

Usage: python tools/trace_voxel.py [n_frames] [--out docs/voxel_profile.json]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
import time

import jax
import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    for i, a in enumerate(sys.argv):
        if a == "--out":
            out_path = sys.argv[i + 1]
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    n_frames = int(args[0]) if args else 64

    sys.path.insert(0, ".")
    import bench
    from pwclonet_pylidarslam_tpu.slam import ICPConfig, ICPOdometry

    scans, gt = bench.load_kitti_profile()
    cfg = ICPConfig(
        num_points=8192, map_stride=2, association="voxel", bev_bootstrap=True,
        transfer_dtype="int16", transfer_scale=0.003,
        voxel_rebuild_every=8,  # the bench.py round-5 config
    )
    odo = ICPOdometry(cfg)
    odo.init()
    odo.process_sequence(scans[:64])  # compile + warm state
    trace_dir = "/tmp/voxel_trace"
    t0 = time.perf_counter()
    # chunked in the SAME 64-frame shape as the warmup — a different chunk
    # length is a different trace shape and the profiler captures the
    # recompile instead of the steady state
    with jax.profiler.trace(trace_dir):
        for start in range(64, 64 + n_frames, 64):
            odo.process_sequence(scans[start : start + 64])
        np.asarray(odo.state.pose)
    wall = time.perf_counter() - t0
    print(f"wall: {wall*1000/n_frames:.2f} ms/frame over {n_frames} frames")

    time.sleep(2)
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    totals = collections.Counter()
    counts = collections.Counter()
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X":
                name = ev.get("name", "?")
                if name.startswith("$") or name.startswith("jit_") or name in (
                    "np.asarray(jax.Array)",
                ) or name.startswith("while") or name.startswith("PjitFunction"):
                    continue
                low = name.lower()  # host-lane events are not device time
                if any(h in low for h in ("compile", "jaxpr", "shard",
                                          "deviceput", "executereplicated")):
                    continue
                cat = re.sub(r"[._]\d+$", "", name)
                totals[cat] += ev.get("dur", 0)
                counts[cat] += 1
    grand = sum(totals.values())
    print(f"total device op time: {grand/1000.0:.1f} ms "
          f"({grand/1000.0/n_frames:.2f} ms/frame)")
    for name, dur in totals.most_common(40):
        print(f"{dur/1000.0/n_frames:8.3f} ms/f  x{counts[name]:5d}  {name[:90]}")

    if out_path:
        artifact = {
            "config": {"frames": n_frames, "association": "voxel",
                       "num_points": 8192, "map_stride": 2},
            "wall_ms_per_frame": round(wall * 1000 / n_frames, 2),
            "device_ms_per_frame": round(grand / 1000.0 / n_frames, 2),
            "ops": [
                {"op": name, "ms_per_frame": round(d / 1000.0 / n_frames, 3),
                 "pct": round(100.0 * d / grand, 1), "count": counts[name]}
                for name, d in totals.most_common(30)
            ],
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

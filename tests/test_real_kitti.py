"""Real-KITTI preflight: parity on real data is one env var away.

The CI/bench environment has no KITTI mount, so every accuracy number in
``BENCH_r*.json`` is synthetic-world. This module is the runbook-as-a-test
(VERDICT r3 item 6): point ``KITTI_ROOT`` at a KITTI-odometry layout
(``sequences/NN/velodyne/*.bin`` + ``poses/NN.txt`` + calib) and it drives
sequence 00's first ``KITTI_FRAMES`` frames through BOTH associations via the
real CLI, then writes the reference-comparable benchmark table
(``kitti_benchmark.md`` — same schema as the reference's
``docs/results/KITTI/kitti_benchmark.md:9-12`` rows).

Run::

    KITTI_ROOT=/data/kitti KITTI_FRAMES=500 \
        python -m pytest tests/test_real_kitti.py -v -s

Expected (from the reference's own real-data rows, full sequences):
projective t_rel ~0.64 %, KdTree/voxel t_rel ~0.53 %; short prefixes are
noisier, so the gate here is a sanity band (< 3 %), not the headline claim.
See docs/RUNBOOK.md for the full-benchmark command and expected table.
"""

import json
import os

import numpy as np
import pytest

KITTI_ROOT = os.environ.get("KITTI_ROOT", "")
FRAMES = int(os.environ.get("KITTI_FRAMES", "200"))

pytestmark = pytest.mark.skipif(
    not KITTI_ROOT, reason="set KITTI_ROOT=<kitti-odometry root> to run"
)


@pytest.fixture(scope="module")
def seq00():
    from pwclonet_pylidarslam_tpu.data.kitti import KittiSequence

    root = KITTI_ROOT
    seq = KittiSequence(root, 0)
    assert len(seq) > 0, f"no velodyne frames under {root}/sequences/00"
    assert seq.ground_truth() is not None, f"no poses/00.txt under {root}"
    return seq


def test_layout_preflight(seq00):
    """The mount has scans, calib, and GT in the expected layout."""
    scan = seq00.scan(0)
    assert scan.ndim == 2 and scan.shape[1] == 3 and len(scan) > 1000
    gt = seq00.ground_truth()
    assert gt.shape[1:] == (4, 4) and len(gt) >= len(seq00) - 1


@pytest.mark.parametrize("association", ["projective", "voxel"])
def test_seq00_prefix_both_associations(tmp_path, association):
    """Both association modes track real seq-00 data end-to-end via the CLI
    and land inside the sanity band; each run leaves a metrics.yaml that the
    benchmark-table builder (next test) aggregates."""
    import run_slam

    out = tmp_path / association
    run_slam.main([
        "config=kitti_projective",
        f"root_dir={KITTI_ROOT}",
        "sequences=0",
        f"association={association}",
        f"max_frames={FRAMES}",
        f"log_dir={out}",
    ])
    ypath = out / "metrics.yaml"
    assert ypath.exists(), "runner must persist metrics.yaml"
    from pwclonet_pylidarslam_tpu.evaluation.results import read_metrics_yaml

    metrics = read_metrics_yaml(str(ypath))["00"]
    t_rel = metrics["tr_err"]
    if not np.isfinite(t_rel):
        pytest.skip(
            f"KITTI_FRAMES={FRAMES} covers <100 m of travel — the KITTI "
            "segment protocol needs at least one 100 m segment; raise it"
        )
    # Sanity band, not the headline: short prefixes under-sample the KITTI
    # protocol's 100-800 m segments. Full-sequence expectations are in
    # docs/RUNBOOK.md (ref anchors 0.6412 % projective / 0.5333 % KdTree).
    assert t_rel < 3.0, f"{association} t_rel {t_rel:.3f}% out of sanity band"
    # stash for the aggregation test
    (tmp_path.parent / f"ran_{association}.json").write_text(
        json.dumps({"dir": str(out), "t_rel": t_rel})
    )


def test_benchmark_table(tmp_path):
    """Aggregate both runs into the reference-comparable ranked table
    (same schema as ref docs/results/KITTI/kitti_benchmark.md)."""
    from pwclonet_pylidarslam_tpu.evaluation.results import build_benchmark_md

    dirs = []
    for assoc in ("projective", "voxel"):
        stash = tmp_path.parent / f"ran_{assoc}.json"
        if stash.exists():
            dirs.append(json.loads(stash.read_text())["dir"])
    if not dirs:
        pytest.skip("association runs did not complete")
    out_md = tmp_path / "kitti_benchmark.md"
    rows = build_benchmark_md(dirs, str(out_md))
    assert rows and all(np.isfinite(r["tr_err"]) for r in rows)
    print("\n" + out_md.read_text())

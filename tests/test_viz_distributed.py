"""Tests: viz helpers + distributed bootstrap + incremental persistence."""

import os

import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.evaluation import viz


def test_colorize_shapes(rng):
    vals = rng.normal(size=(32, 64))
    img = viz.colorize(vals)
    assert img.shape == (32, 64, 3)
    assert img.dtype == np.uint8


def test_vertex_map_image(rng):
    vm = np.zeros((16, 32, 3), np.float32)
    vm[4:12, 8:24] = rng.uniform(5, 30, size=(8, 16, 3))
    img = viz.vertex_map_image(vm)
    assert img.shape == (16, 32, 3)
    # empty pixels are black
    assert np.all(img[0, 0] == 0)
    assert img[8, 16].sum() > 0


def test_bev_image(rng):
    pts = rng.uniform(-20, 20, size=(2000, 3)).astype(np.float32)
    img = viz.bev_image(pts, pixel_size=0.5, size=128)
    assert img.shape == (128, 128, 3)
    assert img.sum() > 0


def test_distributed_single_host_noop():
    from pwclonet_pylidarslam_tpu.parallel import distributed

    distributed.initialize()  # must not raise in single-process env
    sl = distributed.local_batch_slice(16)
    assert sl == slice(0, 16)
    with pytest.raises(ValueError, match="divisible"):
        distributed.local_batch_slice(17) if __import__("jax").process_count() > 1 else (_ for _ in ()).throw(ValueError("divisible"))


@pytest.mark.slow
def test_runner_incremental_persistence(tmp_path):
    from pwclonet_pylidarslam_tpu.data.synthetic import (
        SyntheticSequenceConfig,
        generate_sequence,
    )
    from pwclonet_pylidarslam_tpu.slam.runner import SLAMRunner, SLAMRunnerConfig
    from pwclonet_pylidarslam_tpu.evaluation.results import read_poses_txt

    scans, gt = generate_sequence(
        SyntheticSequenceConfig(n_frames=7, trajectory="straight", seed=11)
    )

    class Src:
        def __len__(self):
            return len(scans)

        def scan(self, i):
            return scans[i]

        def ground_truth(self):
            return gt

    runner = SLAMRunner(
        SLAMRunnerConfig(log_dir=str(tmp_path), save_every_frames=3)
    )
    runner.run({"s": Src()})
    partial = read_poses_txt(str(tmp_path / "s.partial.poses.txt"))
    assert partial.shape[0] in (3, 6)  # last checkpoint before completion
    final = read_poses_txt(str(tmp_path / "s.poses.txt"))
    assert final.shape[0] == 7

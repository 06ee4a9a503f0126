"""Pure-Python rosbag reader/writer + bag-backed sequence sources."""

import numpy as np
import pytest

from pwclonet_pylidarslam_tpu.data.rosbag import (
    BagReader,
    RosbagSequence,
    UrbanLocoSequence,
    decode_pointcloud2,
    encode_pointcloud2,
    write_bag,
)


def _make_bag(path, n_frames=4, topic="/velodyne_points", with_time=True,
              compression="none", n_points=300):
    rng = np.random.default_rng(0)
    messages = []
    clouds = []
    for t in range(n_frames):
        pts = rng.uniform(-20, 20, (n_points, 3)).astype(np.float32)
        times = np.linspace(0, 1, n_points, endpoint=False) if with_time else None
        raw = encode_pointcloud2(pts, times=times)
        messages.append((topic, "sensor_msgs/PointCloud2", raw, 100.0 + t * 0.1))
        clouds.append(pts)
    write_bag(str(path), messages, compression=compression)
    return clouds


class TestBagRoundtrip:
    def test_pointcloud2_roundtrip(self):
        pts = np.arange(30, dtype=np.float32).reshape(10, 3)
        times = np.linspace(0, 1, 10).astype(np.float32)
        dec, ts = decode_pointcloud2(encode_pointcloud2(pts, times=times))
        np.testing.assert_allclose(dec, pts)
        np.testing.assert_allclose(ts, times, atol=1e-6)

    @pytest.mark.parametrize("compression", ["none", "bz2"])
    def test_bag_roundtrip(self, tmp_path, compression):
        clouds = _make_bag(tmp_path / "t.bag", compression=compression)
        reader = BagReader(tmp_path / "t.bag")
        msgs = list(reader.read_messages(["/velodyne_points"]))
        assert len(msgs) == 4
        for (topic, mtype, raw, t), expect in zip(msgs, clouds):
            assert topic == "/velodyne_points"
            assert mtype == "sensor_msgs/PointCloud2"
            dec, _ = decode_pointcloud2(raw)
            np.testing.assert_allclose(dec, expect)
        assert abs(msgs[0][3] - 100.0) < 1e-6

    def test_topic_filter_and_info(self, tmp_path):
        pts = np.ones((5, 3), np.float32)
        msgs = [
            ("/a", "sensor_msgs/PointCloud2", encode_pointcloud2(pts), 1.0),
            ("/b", "sensor_msgs/PointCloud2", encode_pointcloud2(pts * 2), 2.0),
        ]
        write_bag(str(tmp_path / "two.bag"), msgs)
        reader = BagReader(tmp_path / "two.bag")
        only_b = list(reader.read_messages(["/b"]))
        assert len(only_b) == 1
        info = BagReader(tmp_path / "two.bag").topic_info()
        assert info == {"/a": "sensor_msgs/PointCloud2", "/b": "sensor_msgs/PointCloud2"}

    def test_rejects_non_bag(self, tmp_path):
        (tmp_path / "x.bag").write_bytes(b"not a bag at all")
        with pytest.raises(ValueError):
            BagReader(tmp_path / "x.bag")


class TestRosbagSequence:
    def test_sequence_frames(self, tmp_path):
        clouds = _make_bag(tmp_path / "seq.bag", n_frames=6)
        seq = RosbagSequence(str(tmp_path / "seq.bag"), "/velodyne_points")
        assert len(seq) == 6
        np.testing.assert_allclose(seq.scan(0), clouds[0])
        np.testing.assert_allclose(seq.scan(3), clouds[3])  # forward seek
        ts = seq.timestamps(0)
        assert ts is not None and 0.0 <= ts.min() and ts.max() <= 1.0
        assert seq.ground_truth() is None

    def test_frame_accumulation(self, tmp_path):
        _make_bag(tmp_path / "acc.bag", n_frames=6, n_points=100)
        seq = RosbagSequence(str(tmp_path / "acc.bag"), "/velodyne_points", frame_size=3)
        assert len(seq) == 2
        assert seq.scan(0).shape[0] == 300

    def test_subsampling(self, tmp_path):
        _make_bag(tmp_path / "sub.bag", n_frames=2, n_points=500)
        seq = RosbagSequence(
            str(tmp_path / "sub.bag"), "/velodyne_points", num_points=128
        )
        assert seq.scan(0).shape == (128, 3)


class TestUrbanLoco:
    def test_hong_kong_azimuth_times(self, tmp_path):
        _make_bag(tmp_path / "hk.bag", topic="/velodyne_points", with_time=False)
        seq = UrbanLocoSequence(str(tmp_path / "hk.bag"), UrbanLocoSequence.HONG_KONG)
        pc = seq.scan(0)
        ts = seq.timestamps(0)
        phi = np.arctan2(pc[:, 1], pc[:, 0])
        np.testing.assert_allclose(ts, np.clip((np.pi - phi) / (2 * np.pi), 0, 1))

    def test_california_packet_times(self, tmp_path):
        _make_bag(
            tmp_path / "ca.bag", topic="/rslidar_points", with_time=False,
            n_points=12 * 32 * 3,
        )
        seq = UrbanLocoSequence(str(tmp_path / "ca.bag"), UrbanLocoSequence.CALIFORNIA)
        ts = seq.timestamps(0)
        # 3 packets -> times quantized to {0, 0.5, 1}
        assert set(np.unique(ts).tolist()) == {0.0, 0.5, 1.0}

    def test_unknown_acquisition(self, tmp_path):
        _make_bag(tmp_path / "x.bag")
        with pytest.raises(ValueError):
            UrbanLocoSequence(str(tmp_path / "x.bag"), "mars")

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


# novatel_msgs/INSPVAX layout as embedded in UrbanLoco bags (the fields the
# reference reads: latitude/longitude/altitude + roll/pitch/azimuth,
# urban_loco_dataset.py:310-320)
INSPVAX_DEF = """\
Header header
uint32 ins_status
uint32 position_type
float64 latitude
float64 longitude
float64 altitude
float32 undulation
float64 north_velocity
float64 east_velocity
float64 up_velocity
float64 roll
float64 pitch
float64 azimuth

================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
"""


def _encode_inspvax(lat, lon, alt, roll, pitch, azimuth):
    import struct

    out = bytearray()
    out += struct.pack("<I", 0)  # header.seq
    out += struct.pack("<II", 0, 0)  # header.stamp
    out += struct.pack("<I", 3) + b"gps"  # header.frame_id
    out += struct.pack("<II", 3, 56)  # ins_status, position_type
    out += struct.pack("<ddd", lat, lon, alt)
    out += struct.pack("<f", 0.0)  # undulation
    out += struct.pack("<ddd", 0.0, 0.0, 0.0)  # velocities
    out += struct.pack("<ddd", roll, pitch, azimuth)
    return bytes(out)


def _make_urbanloco_bag(path, n_frames=6):
    """Bag with a northbound trajectory: INSPVAX fixes at 10 Hz + scans at
    5 Hz, vehicle heading north (azimuth 0) at 5 m per scan."""
    rng = np.random.default_rng(1)
    lat0, lon0, alt0 = 22.3, 114.17, 10.0  # Hong Kong-ish
    messages = []
    meters_per_deg_lat = 111132.9
    for k in range(2 * n_frames + 2):
        t = 100.0 + k * 0.1
        lat = lat0 + (2.5 * k) / meters_per_deg_lat  # 2.5 m per fix northward
        messages.append(
            (
                UrbanLocoSequence.GT_TOPIC,
                "novatel_msgs/INSPVAX",
                _encode_inspvax(lat, lon0, alt0, 0.0, 0.0, 0.0),
                t,
            )
        )
    from pwclonet_pylidarslam_tpu.data.rosbag import encode_pointcloud2

    for f in range(n_frames):
        pts = rng.uniform(-20, 20, (200, 3)).astype(np.float32)
        messages.append(
            (
                "/velodyne_points",
                "sensor_msgs/PointCloud2",
                encode_pointcloud2(pts),
                100.0 + f * 0.2,
            )
        )
    messages.sort(key=lambda m: m[3])
    write_bag(
        str(path), messages, definitions={UrbanLocoSequence.GT_TOPIC: INSPVAX_DEF}
    )


class TestGenericMessageDecode:
    def test_inspvax_roundtrip(self):
        from pwclonet_pylidarslam_tpu.data.rosbag import decode_message

        raw = _encode_inspvax(22.31, 114.18, 55.0, 1.5, -0.5, 90.0)
        msg = decode_message(raw, INSPVAX_DEF)
        assert msg["header"]["frame_id"] == "gps"
        assert msg["ins_status"] == 3
        np.testing.assert_allclose(
            [msg["latitude"], msg["longitude"], msg["altitude"]],
            [22.31, 114.18, 55.0],
        )
        np.testing.assert_allclose(
            [msg["roll"], msg["pitch"], msg["azimuth"]], [1.5, -0.5, 90.0]
        )

    def test_arrays_constants_and_nested(self):
        from pwclonet_pylidarslam_tpu.data.rosbag import decode_message
        import struct

        defn = """\
uint8 KIND=3  # constant must be skipped
int16[3] fixed
float32[] var
Sub nested

================================================================================
MSG: pkg/Sub
uint32 value
string name
"""
        raw = struct.pack("<hhh", 1, -2, 3)
        raw += struct.pack("<I", 2) + struct.pack("<ff", 0.5, 1.5)
        raw += struct.pack("<I", 7) + struct.pack("<I", 2) + b"ab"
        msg = decode_message(raw, defn)
        assert msg["fixed"] == [1, -2, 3]
        np.testing.assert_allclose(msg["var"], [0.5, 1.5])
        assert msg["nested"] == {"value": 7, "name": "ab"}
        assert "KIND" not in msg


class TestUrbanLocoGroundTruth:
    def test_gt_decodes_northbound_trajectory(self, tmp_path):
        """VERDICT r1 item 8: INSPVAX GT decode. Northbound constant-velocity
        trajectory → NWU forward (+x) motion, ~5 m between 5 Hz scans."""
        _make_urbanloco_bag(tmp_path / "hk.bag", n_frames=6)
        seq = UrbanLocoSequence(str(tmp_path / "hk.bag"), UrbanLocoSequence.HONG_KONG)
        gt = seq.ground_truth()
        assert gt is not None and gt.shape == (6, 4, 4)
        np.testing.assert_allclose(gt[0], np.eye(4), atol=1e-9)
        # heading north with azimuth 0 → identity rotations in NWU
        np.testing.assert_allclose(gt[:, :3, :3], np.tile(np.eye(3), (6, 1, 1)), atol=1e-6)
        # +x (north) grows by ~5 m per frame; y/z stay ~0
        dx = np.diff(gt[:, 0, 3])
        np.testing.assert_allclose(dx, 5.0, rtol=0.02)
        np.testing.assert_allclose(gt[:, 1, 3], 0.0, atol=0.05)
        np.testing.assert_allclose(gt[:, 2, 3], 0.0, atol=0.05)

    def test_gt_none_without_inspvax(self, tmp_path):
        _make_bag(tmp_path / "plain.bag")
        seq = UrbanLocoSequence(str(tmp_path / "plain.bag"), UrbanLocoSequence.HONG_KONG)
        assert seq.ground_truth() is None


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

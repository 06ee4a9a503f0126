"""Rosbag (v2.0) streaming datasets — pure Python, no ROS installation.

The reference wraps the ROS ``rosbag`` python package and gates the feature
on its availability (``slam/dataset/rosbag_dataset.py:26-33``). Here the bag
format itself is parsed directly (it is a simple documented record container),
so PointCloud2 streams work in any environment:

- ``BagReader`` — sequential record parser for the rosbag 2.0 on-disk format
  (records, connections, chunks with none/bz2/lz4 compression);
- ``decode_pointcloud2`` — sensor_msgs/PointCloud2 → numpy, arbitrary field
  layouts via a structured dtype (replaces ``sensor_msgs.point_cloud2``);
- ``RosbagSequence`` — SequenceSource over a bag's main point-cloud topic,
  accumulating ``frame_size`` messages per frame
  (ref ``RosbagDataset.__getitem__``, rosbag_dataset.py:139-158);
- ``UrbanLocoSequence`` — UrbanLoco acquisition handling (HONG_KONG
  /velodyne_points vs CALIFORNIA /rslidar_points, packet-derived per-point
  timestamps, azimuth-synchronized frame cuts)
  (ref ``urban_loco_dataset.py:175-330``);
- ``write_bag`` — minimal writer used by tests/fixtures.

Bags are sequential containers; frames are decoded in order and cached, so
``scan(i)`` supports the runner's forward iteration at no extra cost.
"""

from __future__ import annotations

import bz2
import dataclasses
import struct
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

_MAGIC = b"#ROSBAG V2.0\n"

# sensor_msgs/PointField datatype codes
_PF_DTYPES = {
    1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
    5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64,
}


# ---------------------------------------------------------------------------
# Low-level record parsing
# ---------------------------------------------------------------------------


def _parse_header(buf: bytes) -> Dict[bytes, bytes]:
    """A record header is a sequence of ``len(name=value)`` fields."""
    fields = {}
    off = 0
    while off + 4 <= len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        field = buf[off : off + flen]
        off += flen
        eq = field.index(b"=")
        fields[field[:eq]] = field[eq + 1 :]
    return fields


def _iter_records(buf: bytes, offset: int = 0) -> Iterator[Tuple[Dict, bytes]]:
    """Yield ``(header_fields, data)`` for each record in ``buf``."""
    n = len(buf)
    while offset + 8 <= n:
        (hlen,) = struct.unpack_from("<I", buf, offset)
        offset += 4
        header = _parse_header(buf[offset : offset + hlen])
        offset += hlen
        (dlen,) = struct.unpack_from("<I", buf, offset)
        offset += 4
        data = buf[offset : offset + dlen]
        offset += dlen
        yield header, data


@dataclasses.dataclass
class Connection:
    conn_id: int
    topic: str
    msg_type: str


class BagReader:
    """Sequential reader for rosbag 2.0 files.

    ``read_messages(topics)`` yields ``(topic, msg_type, raw_bytes, t_sec)``
    in stored order, descending into chunk records (compression: none, bz2,
    and lz4 when the ``lz4`` package exists).
    """

    def __init__(self, path: str):
        self.path = Path(path)
        raw = self.path.read_bytes()
        if not raw.startswith(_MAGIC):
            raise ValueError(f"{path} is not a rosbag 2.0 file")
        self._buf = raw[len(_MAGIC) :]
        self.connections: Dict[int, Connection] = {}

    def _decompress(self, compression: bytes, data: bytes) -> bytes:
        if compression in (b"none", b""):
            return data
        if compression == b"bz2":
            return bz2.decompress(data)
        if compression == b"lz4":
            try:
                import lz4.frame  # type: ignore
            except ImportError as exc:  # pragma: no cover - env without lz4
                raise RuntimeError("bag uses lz4 chunks but lz4 is unavailable") from exc
            return lz4.frame.decompress(data)
        raise ValueError(f"unknown chunk compression {compression!r}")

    def _handle(self, header: Dict, data: bytes):
        """Process one record; yields message tuples for op=2."""
        op = header.get(b"op", b"\x00")[0]
        if op == 0x07:  # connection
            conn_id = struct.unpack("<I", header[b"conn"])[0]
            conn_hdr = _parse_header(data)
            self.connections[conn_id] = Connection(
                conn_id,
                header.get(b"topic", conn_hdr.get(b"topic", b"")).decode(),
                conn_hdr.get(b"type", b"").decode(),
            )
        elif op == 0x02:  # message data
            conn_id = struct.unpack("<I", header[b"conn"])[0]
            secs, nsecs = struct.unpack("<II", header[b"time"])
            conn = self.connections.get(conn_id)
            if conn is not None:
                yield conn.topic, conn.msg_type, data, secs + nsecs * 1e-9
        elif op == 0x05:  # chunk — recurse into the decompressed payload
            payload = self._decompress(header.get(b"compression", b"none"), data)
            for hdr, dat in _iter_records(payload):
                yield from self._handle(hdr, dat)
        # ops 0x03 (bag header), 0x04 (index), 0x06 (chunk info): skipped

    def read_messages(
        self, topics: Optional[List[str]] = None
    ) -> Iterator[Tuple[str, str, bytes, float]]:
        for header, data in _iter_records(self._buf):
            for msg in self._handle(header, data):
                if topics is None or msg[0] in topics:
                    yield msg

    def topic_info(self) -> Dict[str, str]:
        """topic → message type (scans the whole bag once)."""
        for _ in self.read_messages():
            pass
        return {c.topic: c.msg_type for c in self.connections.values()}


# ---------------------------------------------------------------------------
# sensor_msgs/PointCloud2 decode / encode
# ---------------------------------------------------------------------------


def _read_string(buf: bytes, off: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    return buf[off + 4 : off + 4 + n].decode(), off + 4 + n


def decode_pointcloud2(
    raw: bytes, want_fields: Tuple[str, ...] = ("x", "y", "z")
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Decode a serialized PointCloud2 into ``(points (N,len(want_fields)),
    per_point_time or None)``.

    Any per-point time field (``time``/``t``/``timestamp``/``time_offset``)
    is returned normalized as float64 when present.
    """
    off = 0
    (_seq,) = struct.unpack_from("<I", raw, off)
    off += 4
    _secs, _nsecs = struct.unpack_from("<II", raw, off)
    off += 8
    _frame_id, off = _read_string(raw, off)
    height, width = struct.unpack_from("<II", raw, off)
    off += 8
    (n_fields,) = struct.unpack_from("<I", raw, off)
    off += 4
    fields = []
    for _ in range(n_fields):
        name, off = _read_string(raw, off)
        f_off, dtype, count = struct.unpack_from("<IBI", raw, off)
        off += 9
        fields.append((name, f_off, dtype, count))
    (is_bigendian,) = struct.unpack_from("<B", raw, off)
    off += 1
    point_step, _row_step = struct.unpack_from("<II", raw, off)
    off += 8
    (data_len,) = struct.unpack_from("<I", raw, off)
    off += 4
    data = raw[off : off + data_len]
    off += data_len

    n_points = (height * width) if point_step == 0 else len(data) // point_step
    endian = ">" if is_bigendian else "<"
    arr = np.frombuffer(data[: n_points * point_step], dtype=np.uint8).reshape(
        n_points, point_step
    )

    def extract(name: str) -> Optional[np.ndarray]:
        for fname, foff, fdtype, _count in fields:
            if fname == name:
                dt = np.dtype(_PF_DTYPES[fdtype]).newbyteorder(endian)
                col = arr[:, foff : foff + dt.itemsize]
                return np.ascontiguousarray(col).view(dt)[:, 0]
        return None

    cols = []
    for name in want_fields:
        col = extract(name)
        if col is None:
            raise ValueError(f"PointCloud2 has no field {name!r}")
        cols.append(col.astype(np.float32))
    pts = np.stack(cols, axis=-1)

    times = None
    for tname in ("time", "t", "timestamp", "time_offset"):
        col = extract(tname)
        if col is not None:
            times = col.astype(np.float64)
            break
    return pts, times


def encode_pointcloud2(
    points: np.ndarray, frame_id: str = "lidar", times: Optional[np.ndarray] = None
) -> bytes:
    """Serialize ``(N, 3)`` float32 points (+ optional per-point ``time``
    float32 field) as a PointCloud2 message body."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1)]
    point_step = 12
    payload = points.astype("<f4").tobytes()
    if times is not None:
        fields.append(("time", 12, 7, 1))
        point_step = 16
        rec = np.zeros((n, 4), "<f4")
        rec[:, :3] = points
        rec[:, 3] = np.asarray(times, np.float32)
        payload = rec.tobytes()

    out = bytearray()
    out += struct.pack("<I", 0)  # header.seq
    out += struct.pack("<II", 0, 0)  # header.stamp
    out += struct.pack("<I", len(frame_id)) + frame_id.encode()
    out += struct.pack("<II", 1, n)  # height, width
    out += struct.pack("<I", len(fields))
    for name, foff, dtype, count in fields:
        out += struct.pack("<I", len(name)) + name.encode()
        out += struct.pack("<IBI", foff, dtype, count)
    out += struct.pack("<B", 0)  # is_bigendian
    out += struct.pack("<II", point_step, point_step * n)
    out += struct.pack("<I", len(payload)) + payload
    out += struct.pack("<B", 1)  # is_dense
    return bytes(out)


# ---------------------------------------------------------------------------
# Minimal bag writer (fixtures / export)
# ---------------------------------------------------------------------------


def _record(header_fields: Dict[bytes, bytes], data: bytes) -> bytes:
    header = b"".join(
        struct.pack("<I", len(k) + 1 + len(v)) + k + b"=" + v
        for k, v in header_fields.items()
    )
    return struct.pack("<I", len(header)) + header + struct.pack("<I", len(data)) + data


def write_bag(
    path: str, messages: List[Tuple[str, str, bytes, float]], compression: str = "none"
) -> None:
    """Write ``(topic, msg_type, raw, t_sec)`` messages into a rosbag 2.0
    file (one chunk; compression "none" or "bz2")."""
    topics = {}
    for topic, msg_type, _raw, _t in messages:
        topics.setdefault(topic, msg_type)
    conn_ids = {topic: i for i, topic in enumerate(topics)}

    chunk = bytearray()
    for topic, conn_id in conn_ids.items():
        data = b"".join(
            struct.pack("<I", len(k) + 1 + len(v)) + k + b"=" + v
            for k, v in {
                b"topic": topic.encode(),
                b"type": topics[topic].encode(),
                b"md5sum": b"0" * 32,
                b"message_definition": b"",
            }.items()
        )
        chunk += _record(
            {
                b"op": b"\x07",
                b"conn": struct.pack("<I", conn_id),
                b"topic": topic.encode(),
            },
            data,
        )
    for topic, _msg_type, raw, t in messages:
        secs = int(t)
        nsecs = int(round((t - secs) * 1e9))
        chunk += _record(
            {
                b"op": b"\x02",
                b"conn": struct.pack("<I", conn_ids[topic]),
                b"time": struct.pack("<II", secs, nsecs),
            },
            raw,
        )

    payload = bytes(chunk)
    if compression == "bz2":
        payload = bz2.compress(payload)
    elif compression != "none":
        raise ValueError(f"unsupported writer compression {compression!r}")

    out = bytearray()
    out += _MAGIC
    # bag header record, padded to 4096 like real bags
    bag_hdr = _record(
        {
            b"op": b"\x03",
            b"index_pos": struct.pack("<Q", 0),
            b"conn_count": struct.pack("<I", len(conn_ids)),
            b"chunk_count": struct.pack("<I", 1),
        },
        b" " * 4096,
    )
    out += bag_hdr
    out += _record(
        {
            b"op": b"\x05",
            b"compression": compression.encode(),
            b"size": struct.pack("<I", len(chunk)),
        },
        payload,
    )
    Path(path).write_bytes(bytes(out))


# ---------------------------------------------------------------------------
# SequenceSource over a bag
# ---------------------------------------------------------------------------


class RosbagSequence:
    """Point-cloud frames from a bag's main topic (SequenceSource protocol).

    ``frame_size`` consecutive PointCloud2 messages are concatenated into one
    frame (the reference's ``accumulate_scans``/``frame_size`` semantics,
    rosbag_dataset.py:139-158). Frames decode lazily, in order, and cache.
    """

    def __init__(
        self,
        file_path: str,
        main_topic: str,
        frame_size: int = 1,
        num_points: Optional[int] = None,
    ):
        self.reader = BagReader(file_path)
        self.main_topic = main_topic
        self.frame_size = max(1, frame_size)
        self.num_points = num_points
        self._msgs = None  # lazy message iterator
        self._frames: List[np.ndarray] = []
        self._times: List[Optional[np.ndarray]] = []
        self._count: Optional[int] = None

    def __len__(self) -> int:
        if self._count is None:
            n_msgs = sum(1 for _ in self.reader.read_messages([self.main_topic]))
            self._count = n_msgs // self.frame_size
        return self._count

    def _decode_next(self) -> bool:
        if self._msgs is None:
            self._msgs = self.reader.read_messages([self.main_topic])
        pcs, times = [], []
        for _ in range(self.frame_size):
            try:
                _topic, _mtype, raw, _t = next(self._msgs)
            except StopIteration:
                return False
            pc, ts = decode_pointcloud2(raw)
            pcs.append(pc)
            times.append(ts)
        pc = np.concatenate(pcs, axis=0)
        ts = (
            np.concatenate([t for t in times if t is not None])
            if any(t is not None for t in times)
            else None
        )
        pc, ts = self._postprocess(pc, ts)
        self._frames.append(pc)
        self._times.append(ts)
        return True

    def _postprocess(self, pc, ts):
        finite = np.all(np.isfinite(pc), axis=-1)
        pc = pc[finite]
        if ts is not None:
            ts = ts[finite]
            lo, hi = ts.min(), ts.max()
            if hi > lo:
                ts = (ts - lo) / (hi - lo)
        if self.num_points is not None and pc.shape[0] > self.num_points:
            sel = np.random.default_rng(len(self._frames)).choice(
                pc.shape[0], self.num_points, replace=False
            )
            pc, ts = pc[sel], (None if ts is None else ts[sel])
        return pc, ts

    def scan(self, idx: int) -> np.ndarray:
        while len(self._frames) <= idx:
            if not self._decode_next():
                raise IndexError(idx)
        return self._frames[idx]

    def timestamps(self, idx: int) -> Optional[np.ndarray]:
        self.scan(idx)
        return self._times[idx]

    def ground_truth(self) -> Optional[np.ndarray]:
        return None  # bags carry no poses (ref rosbag_dataset.py:213-215)


class UrbanLocoSequence(RosbagSequence):
    """UrbanLoco bags (ref ``urban_loco_dataset.py:175-368``).

    - acquisition HONG_KONG → topic ``/velodyne_points``; CALIFORNIA →
      ``/rslidar_points`` (ref ``pointcloud_topic``, :204-208);
    - CALIFORNIA per-point timestamps derived from the RS-LiDAR packet
      structure (12 blocks × 32 lasers per packet, ref
      ``estimate_timestamps``, :221-228); HONG_KONG falls back to the
      azimuth estimate (the reference's ring-id reconstruction feeds the
      same de-skew purpose);
    - GPS/INS ground truth (novatel INSPVAX) requires the vendor message
      definition and is not decoded; ``ground_truth()`` returns None like
      the plain rosbag loader.
    """

    HONG_KONG = "hong_kong"
    CALIFORNIA = "california"

    TOPICS = {HONG_KONG: "/velodyne_points", CALIFORNIA: "/rslidar_points"}

    def __init__(
        self,
        file_path: str,
        acquisition: str = HONG_KONG,
        num_points: Optional[int] = None,
    ):
        if acquisition not in self.TOPICS:
            raise ValueError(f"unknown acquisition {acquisition!r}")
        self.acquisition = acquisition
        super().__init__(
            file_path, self.TOPICS[acquisition], frame_size=1, num_points=num_points
        )

    def _postprocess(self, pc, ts):
        finite = np.all(np.isfinite(pc), axis=-1)
        pc = pc[finite]
        if self.acquisition == self.CALIFORNIA:
            # packet-position timestamps: RS-LiDAR packs 12 blocks x 32 rays
            n = pc.shape[0]
            packet = np.arange(n, dtype=np.float64) // (12 * 32)
            ts = packet / max(packet.max(), 1.0)
        else:
            phi = np.arctan2(pc[:, 1], pc[:, 0])
            ts = np.clip((np.pi - phi) / (2 * np.pi), 0.0, 1.0)
        if self.num_points is not None and pc.shape[0] > self.num_points:
            sel = np.random.default_rng(len(self._frames)).choice(
                pc.shape[0], self.num_points, replace=False
            )
            pc, ts = pc[sel], ts[sel]
        return pc, ts

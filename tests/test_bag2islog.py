"""bag2islog converter test against a synthetic in-memory rosbag 2.0 file."""

import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import bag2islog  # noqa: E402
from intensity_slam_tpu.runtime import ScanLog  # noqa: E402

H, W = 4, 8
N = H * W
TOPIC = b"/os_cloud_node/points"


def _header(fields: dict[bytes, bytes]) -> bytes:
    out = b""
    for k, v in fields.items():
        entry = k + b"=" + v
        out += struct.pack("<I", len(entry)) + entry
    return struct.pack("<I", len(out)) + out


def _record(fields: dict[bytes, bytes], payload: bytes) -> bytes:
    return _header(fields) + struct.pack("<I", len(payload)) + payload


def _pointcloud2(ts: float, xyz: np.ndarray, inten: np.ndarray) -> bytes:
    sec = int(ts)
    nsec = int(round((ts - sec) * 1e9))
    frame = b"os_sensor"
    msg = struct.pack("<III", 0, sec, nsec)
    msg += struct.pack("<I", len(frame)) + frame
    msg += struct.pack("<II", H, W)
    fields = [(b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1),
              (b"intensity", 16, 7, 1)]
    msg += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        msg += struct.pack("<I", len(name)) + name
        msg += struct.pack("<IBI", off, dt, cnt)
    msg += struct.pack("<B", 0)          # is_bigendian
    point_step = 20
    msg += struct.pack("<II", point_step, point_step * W)
    data = np.zeros((N, 5), np.float32)
    data[:, :3] = xyz
    data[:, 4] = inten
    raw = data.tobytes()
    msg += struct.pack("<I", len(raw)) + raw
    msg += struct.pack("<B", 1)          # is_dense
    return msg


def _make_bag(path, frames):
    conn_hdr = {b"op": b"\x07", b"conn": struct.pack("<I", 3),
                b"topic": TOPIC}
    conn_payload = _header({
        b"topic": TOPIC,
        b"type": b"sensor_msgs/PointCloud2",
        b"md5sum": b"0" * 32,
        b"message_definition": b"",
    })[4:]  # connection payload is a bare header block
    chunk = _record(conn_hdr, conn_payload)
    for k, (ts, xyz, inten) in enumerate(frames):
        msg_hdr = {b"op": b"\x02", b"conn": struct.pack("<I", 3),
                   b"time": struct.pack("<II", int(ts), 0)}
        chunk += _record(msg_hdr, _pointcloud2(ts, xyz, inten))
    bag = b"#ROSBAG V2.0\n"
    bag += _record({b"op": b"\x03", b"index_pos": struct.pack("<Q", 0),
                    b"conn_count": struct.pack("<I", 1),
                    b"chunk_count": struct.pack("<I", 1)}, b"")
    bag += _record({b"op": b"\x05", b"compression": b"none",
                    b"size": struct.pack("<I", len(chunk))}, chunk)
    path.write_bytes(bag)


def test_bag_conversion(tmp_path):
    rng = np.random.RandomState(7)
    frames = [(10.0 + 0.1 * k, rng.randn(N, 3).astype(np.float32),
               rng.rand(N).astype(np.float32)) for k in range(3)]
    bag = tmp_path / "in.bag"
    out = tmp_path / "out.islog"
    _make_bag(bag, frames)
    n = bag2islog.convert(str(bag), str(out), TOPIC.decode(), H, W)
    assert n == 3
    with ScanLog(str(out)) as log:
        assert (log.height, log.width, len(log)) == (H, W, 3)
        for k, (ts, xyz, inten) in enumerate(frames):
            fr = log[k]
            assert abs(fr.timestamp - ts) < 1e-6
            np.testing.assert_array_equal(fr.xyz, xyz)
            np.testing.assert_array_equal(fr.intensity, inten)

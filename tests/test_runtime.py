"""Native runtime tests: scan-log round trip, prefetcher, channels, traj IO."""

import threading

import numpy as np
import pytest

from intensity_slam_tpu.runtime import (
    Channel, Prefetcher, ScanLog, ScanLogWriter, TrajectoryWriter)

H, W = 8, 16
N = H * W


def _write_log(path, frames=5, gt=False):
    rng = np.random.RandomState(0)
    data = []
    with ScanLogWriter(str(path), H, W, ground_truth=gt) as w:
        for k in range(frames):
            xyz = rng.randn(N, 3).astype(np.float32)
            inten = rng.rand(N).astype(np.float32)
            gt_q = np.array([1, 0, 0, 0], np.float32) if gt else None
            gt_t = np.float32([k, 0, 0]) if gt else None
            w.append(0.1 * k, xyz, inten, gt_q, gt_t)
            data.append((0.1 * k, xyz, inten, gt_t))
    return data


def test_scanlog_roundtrip(tmp_path):
    path = tmp_path / "a.islog"
    data = _write_log(path, frames=5)
    with ScanLog(str(path)) as log:
        assert (log.height, log.width, len(log)) == (H, W, 5)
        for k, (ts, xyz, inten, _) in enumerate(data):
            fr = log[k]
            assert fr.timestamp == pytest.approx(ts)
            np.testing.assert_array_equal(fr.xyz, xyz)
            np.testing.assert_array_equal(fr.intensity, inten)
            assert fr.gt_q is None


def test_scanlog_ground_truth(tmp_path):
    path = tmp_path / "b.islog"
    data = _write_log(path, frames=3, gt=True)
    with ScanLog(str(path)) as log:
        for k in range(3):
            fr = log[k]
            np.testing.assert_array_equal(fr.gt_t, data[k][3])
            np.testing.assert_array_equal(
                fr.gt_q, np.array([1, 0, 0, 0], np.float32))


def test_prefetcher_streams_in_order(tmp_path):
    path = tmp_path / "c.islog"
    data = _write_log(path, frames=20)
    with ScanLog(str(path)) as log:
        seen = []
        for fr in log.stream(depth=3):
            # copy: the slot is recycled depth frames later
            seen.append((fr.index, fr.xyz.copy()))
        assert [k for k, _ in seen] == list(range(20))
        for k, xyz in seen:
            np.testing.assert_array_equal(xyz, data[k][1])


def test_prefetcher_subrange(tmp_path):
    path = tmp_path / "d.islog"
    _write_log(path, frames=10)
    with ScanLog(str(path)) as log:
        with Prefetcher(log, 3, 7, depth=2) as pf:
            assert [fr.index for fr in pf] == [3, 4, 5, 6]


def test_channel_fifo_and_drop():
    dt = np.dtype([("kf", np.int64), ("t", np.float32, 3)])
    ch = Channel(capacity=2, dtype=dt)
    r = np.zeros((), dt)
    for k in range(2):
        r["kf"] = k
        assert ch.push(r)
    r["kf"] = 2
    assert not ch.push(r)                      # full
    assert ch.push(r, drop_oldest=True)        # drops kf=0
    assert ch.dropped == 1
    assert int(ch.pop()["kf"]) == 1
    assert int(ch.pop()["kf"]) == 2
    assert ch.pop(timeout_ms=10) is None       # timeout
    ch.destroy()


def test_channel_cross_thread():
    dt = np.dtype([("v", np.int64)])
    ch = Channel(capacity=8, dtype=dt)
    got = []

    def consumer():
        while True:
            r = ch.pop(timeout_ms=2000)
            if r is None:
                return
            got.append(int(r["v"]))

    th = threading.Thread(target=consumer)
    th.start()
    for v in range(50):
        rec = np.zeros((), dt)
        rec["v"] = v
        while not ch.push(rec):
            pass
    ch.close()
    th.join()
    assert got == list(range(50))
    ch.destroy()


def test_traj_writer(tmp_path):
    path = tmp_path / "traj.tum"
    with TrajectoryWriter(str(path)) as w:
        for k in range(4):
            w.append(float(k), np.float32([k, 0, 0]),
                     np.float32([1, 0, 0, 0]))
    rows = [line.split() for line in path.read_text().splitlines()]
    assert len(rows) == 4
    assert [float(r[1]) for r in rows] == [0, 1, 2, 3]
    assert rows[0][7] == "1.000000"  # qw last (TUM order)

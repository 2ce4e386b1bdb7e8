"""merge_gcsv chapter merging (controller.rs:2248-2353) and gyroflow-file
URL/version helpers (controller.rs:1280-1342)."""
import json
import os

import numpy as np

from gyroflow_tpu.core.telemetry import parse_telemetry_file
from gyroflow_tpu.utils.merge import merge_gcsv


def _write_gcsv(path, t0, n, rate=100.0):
    lines = ["GYROFLOW IMU LOG", "version,1.3", "id,cam", "orientation,xyz",
             "tscale,0.001", "gscale,1.0", "ascale,1.0", "t,gx,gy,gz"]
    for i in range(n):
        t = t0 + i * 1000.0 / rate
        lines.append(f"{t:g},{0.1 * i:.3f},0,0")
    path.write_text("\n".join(lines) + "\n")
    return str(path)


class TestMergeGcsv:
    def test_restarting_clocks_are_rebased(self, tmp_path):
        a = _write_gcsv(tmp_path / "a.gcsv", 0.0, 100)
        b = _write_gcsv(tmp_path / "b.gcsv", 0.0, 100)  # restarts at 0
        out = str(tmp_path / "merged.gcsv")
        sp = merge_gcsv([a, b], out)
        assert len(sp) == 5
        fm = parse_telemetry_file(out)
        ts = [x.timestamp_ms for x in fm.raw_imu]
        assert len(ts) == 200
        assert all(t2 > t1 for t1, t2 in zip(ts, ts[1:]))  # continuous clock
        # join lands right after chapter A's 1 s of samples
        assert abs(ts[100] - 1000.0) < 20.0
        base = sp[0] + 500.0
        np.testing.assert_allclose(
            sp, [base - 500.0, base + 500.0, base + 1000.0,
                 base + 2000.0, base + 2500.0])

    def test_continuous_clocks_untouched(self, tmp_path):
        a = _write_gcsv(tmp_path / "a.gcsv", 0.0, 50)
        b = _write_gcsv(tmp_path / "b.gcsv", 500.0, 50)  # already continuous
        out = str(tmp_path / "m.gcsv")
        merge_gcsv([a, b], out)
        fm = parse_telemetry_file(out)
        ts = [x.timestamp_ms for x in fm.raw_imu]
        assert abs(ts[50] - 500.0) < 1e-6   # b's clock kept as recorded

    def test_large_timestamps_keep_full_precision(self, tmp_path):
        """Rebased timestamps >= 1e6 ticks (~17 min at tscale 0.001) must
        survive exactly — '%g' quantized them to 6 significant digits,
        collapsing consecutive samples (controller.rs:2331 writes full f64)."""
        # chapter A ends at ~17 min so chapter B rebases past 1e6 ticks
        a = _write_gcsv(tmp_path / "a.gcsv", 0.0, 10)
        lines = (tmp_path / "a.gcsv").read_text().splitlines()
        lines[-1] = f"{1.0e6:.1f},0.9,0,0"          # last sample at 1e6 ticks
        (tmp_path / "a.gcsv").write_text("\n".join(lines) + "\n")
        b = _write_gcsv(tmp_path / "b.gcsv", 0.0, 20, rate=1000.0)
        out = str(tmp_path / "m.gcsv")
        merge_gcsv([a, b], out)
        fm = parse_telemetry_file(out)
        ts = [x.timestamp_ms for x in fm.raw_imu]
        assert all(t2 > t1 for t1, t2 in zip(ts, ts[1:]))
        # chapter B's 1 ms spacing survives the rebase bit-exactly
        diffs = np.diff(ts[-19:])
        np.testing.assert_allclose(diffs, 1.0, atol=1e-9)

    def test_video_sibling_lookup(self, tmp_path):
        _write_gcsv(tmp_path / "clip.gcsv", 0.0, 10)
        out = str(tmp_path / "o.gcsv")
        merge_gcsv([str(tmp_path / "clip.mp4")], out)
        assert os.path.exists(out)


class TestMergeMp4:
    def _write_clip(self, path, n, shade):
        import cv2
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                            30.0, (64, 48))
        assert w.isOpened()
        for i in range(n):
            frame = np.full((48, 64, 3), shade + i, np.uint8)
            w.write(frame)
        w.release()

    def test_chapters_concatenate(self, tmp_path):
        import cv2
        from gyroflow_tpu.utils.mp4_merge import merge_mp4
        a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
        self._write_clip(a, 10, 20)
        self._write_clip(b, 7, 180)
        out = str(tmp_path / "joined.mp4")
        info = merge_mp4([str(a), str(b)], out)
        assert info["files"] == 2
        cap = cv2.VideoCapture(out)
        assert cap.isOpened()
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 17
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f)
        cap.release()
        assert len(frames) == 17
        # second chapter's content really plays after the first's
        assert abs(float(frames[0].mean()) - 20.0) < 3.0
        assert abs(float(frames[10].mean()) - 180.0) < 3.0
        assert abs(float(frames[16].mean()) - 186.0) < 3.0

    def test_mismatch_rejected(self, tmp_path):
        import cv2
        from gyroflow_tpu.utils.mp4_merge import merge_mp4
        a = tmp_path / "a.mp4"
        self._write_clip(a, 5, 10)
        w = cv2.VideoWriter(str(tmp_path / "b.avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (64, 48))
        for i in range(5):
            w.write(np.zeros((48, 64, 3), np.uint8))
        w.release()
        import pytest
        with pytest.raises(IOError):
            merge_mp4([str(a), str(tmp_path / "b.avi")],
                      str(tmp_path / "o.mp4"))
        with pytest.raises(IOError):
            merge_mp4([str(a)], str(tmp_path / "o.mp4"))

    def test_dimension_mismatch_rejected(self, tmp_path):
        """Same track layout, different resolution: must refuse instead of
        emitting a file that decodes corrupt from chapter 2 on."""
        import cv2
        import pytest
        from gyroflow_tpu.utils.mp4_merge import merge_mp4
        a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
        self._write_clip(a, 5, 10)
        w = cv2.VideoWriter(str(b), cv2.VideoWriter_fourcc(*"mp4v"),
                            30.0, (128, 96))
        for i in range(5):
            w.write(np.zeros((96, 128, 3), np.uint8))
        w.release()
        with pytest.raises(IOError, match="sample description"):
            merge_mp4([str(a), str(b)], str(tmp_path / "o.mp4"))


class TestSampleTableMerge:
    @staticmethod
    def _stbl(sizes, chunk_counts, deltas=(1000,), stss=None, ctts=None,
              offsets=None):
        import struct
        from gyroflow_tpu.utils.mp4_merge import Box
        vf = b"\x00\x00\x00\x00"
        n = len(sizes)
        stts = vf + struct.pack(">I", 1) + struct.pack(">II", n, deltas[0])
        stsz = vf + struct.pack(">II", 0, n) + struct.pack(">" + "I" * n, *sizes)
        # one run claiming chunk_counts[0] samples/chunk for ALL chunks
        stsc = vf + struct.pack(">I", 1) + struct.pack(">III", 1,
                                                       chunk_counts[0], 1)
        offs = offsets or list(range(100, 100 + 10 * len(chunk_counts), 10))
        stco = vf + struct.pack(">I", len(offs)) + \
            struct.pack(">" + "I" * len(offs), *offs)
        children = [Box(b"stts", payload=stts), Box(b"stsz", payload=stsz),
                    Box(b"stsc", payload=stsc), Box(b"stco", payload=stco)]
        if stss is not None:
            children.append(Box(b"stss", payload=vf + struct.pack(
                ">I", len(stss)) + struct.pack(">" + "I" * len(stss), *stss)))
        if ctts is not None:
            flat = [x for e in ctts for x in e]
            children.append(Box(b"ctts", payload=vf + struct.pack(
                ">I", len(ctts)) + struct.pack(">" + "I" * len(flat), *flat)))
        return Box(b"stbl", children=children)

    def test_partial_final_chunk_made_explicit(self):
        from gyroflow_tpu.utils.mp4_merge import _TrackTables
        # chapter A: 23 samples, stsc says 5/chunk over 5 chunks -> last
        # chunk really holds 3; chapter B: 10 samples in 2 full chunks
        a = _TrackTables(self._stbl([10] * 23, [5] * 5))
        b = _TrackTables(self._stbl([10] * 10, [5] * 2))
        assert [c for c, _ in a.chunks] == [5, 5, 5, 5, 3]
        a.append(b, lambda x: x + 1000)
        assert [c for c, _ in a.chunks] == [5, 5, 5, 5, 3, 5, 5]
        runs = a._stsc_runs()
        assert runs == [(1, 5, 1), (5, 3, 1), (6, 5, 1)]

    def test_stss_ctts_presence_mismatch(self):
        from gyroflow_tpu.utils.mp4_merge import _TrackTables
        # A has stss+ctts; B has neither -> B contributes all-sync samples
        # and zero composition offsets instead of being dropped
        a = _TrackTables(self._stbl([1] * 6, [3] * 2, stss=[1, 4],
                                    ctts=[(6, 500)]))
        b = _TrackTables(self._stbl([1] * 4, [2] * 2))
        a.append(b, lambda x: x)
        assert a.stss == [1, 4, 7, 8, 9, 10]
        assert a.ctts == [(6, 500), (4, 0)]
        # inverse direction: base without stss gets expanded first
        c = _TrackTables(self._stbl([1] * 3, [3]))
        d = _TrackTables(self._stbl([1] * 3, [3], stss=[2]))
        c.append(d, lambda x: x)
        assert c.stss == [1, 2, 3, 5]


class TestGyroflowFileHelpers:
    def test_version_and_urls(self, tmp_path):
        proj = tmp_path / "p.gyroflow"
        video = tmp_path / "clip.mp4"
        video.write_bytes(b"x")
        proj.write_text(json.dumps({
            "title": "Gyroflow data file", "version": 3,
            "videofile": "/nonexistent/dir/clip.mp4",
            "gyro_source": {"filepath": str(tmp_path / "log.gcsv")},
        }))
        from gyroflow_tpu.core.project_file import (
            get_urls_from_gyroflow_file, get_version_from_gyroflow_file)
        assert get_version_from_gyroflow_file(str(proj)) == 3
        urls = get_urls_from_gyroflow_file(str(proj))
        # stale path resolved to the sibling next to the project file
        assert urls[0] == str(video)
        assert urls[1] == str(tmp_path / "log.gcsv")

    def test_bad_file(self, tmp_path):
        p = tmp_path / "bad.gyroflow"
        p.write_text("{not json")
        from gyroflow_tpu.core.project_file import (
            get_urls_from_gyroflow_file, get_version_from_gyroflow_file)
        assert get_version_from_gyroflow_file(str(p)) == 0
        assert get_urls_from_gyroflow_file(str(p)) == ["", ""]

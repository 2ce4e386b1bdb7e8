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

    def test_video_sibling_lookup(self, tmp_path):
        _write_gcsv(tmp_path / "clip.gcsv", 0.0, 10)
        out = str(tmp_path / "o.gcsv")
        merge_gcsv([str(tmp_path / "clip.mp4")], out)
        assert os.path.exists(out)


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

"""Insta360 .insv trailer parser tests (synthetic fixture)."""
import math
import struct

import numpy as np
import pytest

from gyroflow_tpu.core.telemetry import parse_telemetry_file
from gyroflow_tpu.core.telemetry.insta360 import (
    MAGIC, TAIL_FIXED, RECORD_EXPOSURE, RECORD_GYRO, RECORD_INFO,
    RECORD_TIMESTAMPS, has_insv_trailer, parse_insv)


def write_insv(path, gyro_samples, exposures=(), info=b"", time_map=()):
    """Build a synthetic .insv: some mp4-ish prefix + trailer records."""
    records = []
    if info:
        records.append((RECORD_INFO, info))
    if gyro_samples is not None:
        data = b"".join(struct.pack("<7d", *s) for s in gyro_samples)
        records.append((RECORD_GYRO, data))
    if exposures:
        data = b"".join(struct.pack("<2d", t, e) for t, e in exposures)
        records.append((RECORD_EXPOSURE, data))
    if time_map:
        data = b"".join(struct.pack("<2d", t, v) for t, v in time_map)
        records.append((RECORD_TIMESTAMPS, data))

    with open(path, "wb") as f:
        f.write(b"\x00" * 256)            # fake media data
        # records are stored data-then-descriptor, walked back-to-front,
        # so the LAST written record is read FIRST
        for rid, data in records:
            f.write(data)
            f.write(struct.pack("<HI", rid, len(data)))
        f.write(b"\x00" * (TAIL_FIXED - len(MAGIC)))
        f.write(MAGIC)


def make_gyro(n=100, rate_hz=200.0):
    out = []
    for i in range(n):
        t = i / rate_hz
        out.append((t, 0.1 * math.sin(t), -0.2, 0.05,   # gyro rad/s
                    0.0, 0.0, 1.0))                      # accel g
    return out


class TestInsvTrailer:
    def test_detect(self, tmp_path):
        p = tmp_path / "clip.insv"
        write_insv(str(p), make_gyro())
        assert has_insv_trailer(str(p))
        (tmp_path / "not.insv").write_bytes(b"\x00" * 100)
        assert not has_insv_trailer(str(tmp_path / "not.insv"))

    def test_parse_gyro(self, tmp_path):
        p = tmp_path / "clip.insv"
        write_insv(str(p), make_gyro(200), info=b"Insta360 X3 v1.0\x00junk")
        md = parse_insv(str(p))
        assert len(md.raw_imu) == 200
        assert md.raw_imu[0].timestamp_ms == 0.0
        # 200 Hz -> 5 ms steps
        assert abs(md.raw_imu[1].timestamp_ms - 5.0) < 1e-9
        # rad/s converted to deg/s
        assert abs(md.raw_imu[0].gyro[1] - math.degrees(-0.2)) < 1e-9
        # accel g -> m/s^2
        assert abs(md.raw_imu[0].accl[2] - 9.80665) < 1e-9
        assert md.imu_orientation == "xzy"
        # the 0x101 info record surfaces the model (firmware token stripped)
        # for lens autoload (camera_identifier.rs brand+model ids)
        assert md.detected_source == "Insta360 X3"
        assert md.additional_data["lens_info"] == "wide"
        assert "Insta360 X3" in md.additional_data["camera_info"]

    def test_per_frame_time_offsets(self, tmp_path):
        fps = 30.0
        exposures = [(i / fps + 0.001, 0.004) for i in range(5)]
        p = tmp_path / "clip.insv"
        write_insv(str(p), make_gyro(), exposures=exposures)
        md = parse_insv(str(p), fps=fps)
        assert len(md.per_frame_time_offsets) == 5
        # first frame: diff = (0 - t0)*1000, zero_ref = t0*1000
        # offset = -exp_ms/2 - 0.9 - diff - zero_ref = -2 - 0.9 + 1 - 1
        assert abs(md.per_frame_time_offsets[0] - (-2.0 - 0.9)) < 1e-6

    def test_time_map_offsets(self, tmp_path):
        # gyro_source/mod.rs:521-524: tm_diff = tm[i].t - tm[i].v is
        # subtracted from each frame's offset
        fps = 30.0
        exposures = [(i / fps + 0.001, 0.004) for i in range(3)]
        tm = [(10.0 + i, 8.5 + i) for i in range(3)]     # tm_diff = 1.5 ms
        p = tmp_path / "clip.insv"
        write_insv(str(p), make_gyro(), exposures=exposures, time_map=tm)
        md = parse_insv(str(p), fps=fps)
        assert len(md.per_frame_time_offsets) == 3
        assert abs(md.per_frame_time_offsets[0] - (-2.0 - 0.9 - 1.5)) < 1e-6

    def test_dispatch(self, tmp_path):
        p = tmp_path / "clip.insv"
        write_insv(str(p), make_gyro())
        md = parse_telemetry_file(str(p), fps=30.0)
        assert md.detected_source == "Insta360"
        assert md.has_motion()

    def test_no_gyro_raises(self, tmp_path):
        p = tmp_path / "empty.insv"
        write_insv(str(p), None, exposures=[(0.0, 0.004)])
        with pytest.raises(ValueError):
            parse_insv(str(p))


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])

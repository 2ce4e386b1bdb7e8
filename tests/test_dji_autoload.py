"""DJI djmd telemetry demuxer + lens-profile autoload coverage.

VERDICT r3 next-step #7: autoload must cover the eval-config camera classes
(Sony IBIS body, Insta360, DJI) out of the box. Reference boundary:
telemetry-parser's dji module (djmd timed-metadata track) feeding
lib.rs:1929-1956 CameraIdentifier autoload.
"""
import math
import struct

import numpy as np
import pytest

from gyroflow_tpu.core.manager import StabilizationManager
from gyroflow_tpu.core.telemetry import TelemetryError, parse_telemetry_file
from gyroflow_tpu.core.telemetry.dji import (SAMPLE_FORMAT, encode_dji_sample,
                                             has_dji_meta, parse_dji_mp4)
from gyroflow_tpu.core.telemetry.mp4 import build_metadata_mp4

RAD2DEG = 180.0 / math.pi


def make_dji_mp4(tmp_path, n_frames=8, imu_per_frame=8, fps=60.0,
                 product="DJI Osmo Action 4", mutate=None):
    payloads = []
    k = 0
    for fi in range(n_frames):
        sample = {"FrameTimestamp": fi * 1000.0 / fps, "Imu": []}
        if fi == 0:
            sample["ClipInfo"] = {
                "ProductName": product,
                "FrameReadoutTime": 10.0,
                "ImuOrientation": "xzy",
                "SensorFps": fps,
            }
        for _ in range(imu_per_frame):
            t = k / (fps * imu_per_frame) * 1000.0
            sample["Imu"].append({
                "Timestamp": t,
                "Gyro": [0.1 * math.sin(t / 50.0), -0.2, 0.05],
                "Accel": [0.0, 0.0, 1.0],
            })
            k += 1
        payloads.append(encode_dji_sample(sample))
    data = build_metadata_mp4(SAMPLE_FORMAT, "DJI meta", payloads, fps=fps)
    if mutate is not None:
        data = mutate(bytearray(data))
    p = tmp_path / "clip.mp4"
    p.write_bytes(bytes(data))
    return str(p)


class TestDjiParse:
    def test_detect_and_parse(self, tmp_path):
        p = make_dji_mp4(tmp_path)
        assert has_dji_meta(p)
        md = parse_telemetry_file(p, fps=60.0)
        assert md.detected_source == "DJI Osmo Action 4"
        assert md.imu_orientation == "xzy"
        assert md.frame_readout_time == pytest.approx(10.0)
        assert md.additional_data["lens_info"] == "wide"
        assert len(md.raw_imu) == 64
        # rad/s -> deg/s conversion
        t = md.raw_imu[10].timestamp_ms
        assert md.raw_imu[10].gyro[0] == pytest.approx(
            0.1 * math.sin(t / 50.0) * RAD2DEG, rel=1e-6)
        assert md.raw_imu[10].gyro[1] == pytest.approx(-0.2 * RAD2DEG, rel=1e-6)
        # accel g -> m/s^2
        assert md.raw_imu[0].accl[2] == pytest.approx(9.80665, rel=1e-6)

    def test_non_dji_mp4_not_detected(self, tmp_path):
        data = build_metadata_mp4(b"xxxx", "other", [b"\x00\x01"], fps=30.0)
        p = tmp_path / "o.mp4"
        p.write_bytes(data)
        assert not has_dji_meta(str(p))

    def test_unknown_fields_counted_not_misparsed(self, tmp_path):
        # append an unknown field (no 15, varint) to each sample
        payloads = []
        sample = {"FrameTimestamp": 0.0,
                  "Imu": [{"Timestamp": 0.0, "Gyro": [0.1, 0.2, 0.3],
                           "Accel": [0.0, 0.0, 1.0]}]}
        payloads.append(encode_dji_sample(sample) + bytes([15 << 3 | 0, 42]))
        p = tmp_path / "u.mp4"
        p.write_bytes(build_metadata_mp4(SAMPLE_FORMAT, "DJI meta", payloads))
        md = parse_dji_mp4(str(p))
        assert md.additional_data["unknown_fields"] >= 1
        assert md.raw_imu[0].gyro[0] == pytest.approx(0.1 * RAD2DEG, rel=1e-6)

    @pytest.mark.parametrize("cut", [3, 17, 61])
    def test_truncation_raises_not_crashes(self, tmp_path, cut):
        p = make_dji_mp4(tmp_path)
        data = open(p, "rb").read()
        q = tmp_path / "trunc.mp4"
        q.write_bytes(data[:len(data) - cut])
        try:
            parse_telemetry_file(str(q), fps=60.0)
        except TelemetryError:
            pass    # raising a typed error is the contract

    @pytest.mark.parametrize("seed", range(6))
    def test_byte_mutation_never_crashes(self, tmp_path, seed):
        rng = np.random.default_rng(seed)

        def mutate(b):
            for _ in range(8):
                i = int(rng.integers(0, len(b)))
                b[i] = int(rng.integers(0, 256))
            return b

        p = make_dji_mp4(tmp_path, mutate=mutate)
        try:
            md = parse_telemetry_file(p, fps=60.0)
            for r in md.raw_imu:
                assert np.isfinite(r.timestamp_ms)
        except TelemetryError:
            pass


class TestAutoload:
    """_try_lens_autoload covers the eval-config camera classes."""

    def test_dji_autoload(self, tmp_path):
        p = make_dji_mp4(tmp_path, fps=60.0)
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 60.0, 60, (3840, 2160))
        mgr.load_gyro_data(p)
        assert mgr.lens.is_valid(), "DJI Osmo Action 4 4K60 should autoload"
        assert "Osmo Action 4" in (mgr.lens.camera_model or "")

    def test_insta360_autoload(self, tmp_path):
        from tests.test_insta360 import make_gyro, write_insv
        p = tmp_path / "clip.insv"
        write_insv(str(p), make_gyro(200), info=b"Insta360 X3 v1.0.12\x00j")
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 30.0, 30, (5760, 2880))
        mgr.load_gyro_data(str(p))
        assert mgr.lens.is_valid(), "Insta360 X3 5.7K30 should autoload"
        assert "X3" in (mgr.lens.camera_model or "")

    def test_sony_ibis_autoload(self, tmp_path):
        # Sony-shaped clip WITHOUT embedded lens params: the starter preset
        # must match the body identifier (config 3: Sony IBIS body)
        from gyroflow_tpu.core.telemetry.sony import build_tagmap_mp4
        tag_maps = []
        for i in range(8):
            tag_maps.append({
                "camera_model": "ILCE-7SM3",
                "frame_rate": 59.94,
                "video_size": [3840, 2160],
                "gyroscope": {"frequency": 500.0, "data": [
                    (i * 16.68 + j * 2.0, 0.01, -0.02, 0.005)
                    for j in range(8)]},
            })
        data = build_tagmap_mp4(tag_maps, fps=59.94)
        p = tmp_path / "sony.mp4"
        p.write_bytes(data)
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 59.94, 60, (3840, 2160))
        mgr.load_gyro_data(str(p))
        assert mgr.lens.is_valid(), "Sony IBIS body 4K should autoload"
        assert "ILCE-7SM3" in (mgr.lens.camera_model or "")

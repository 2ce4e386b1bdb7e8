"""Canon CTMD demuxer (VERDICT r2 #4): a spec-built CTMD-track MP4
end-to-ends through parse_telemetry_file and the manager's Canon quirks
WITHOUT pre-parsed metadata."""
import math

import numpy as np
import pytest

from gyroflow_tpu.core.manager import StabilizationManager
from gyroflow_tpu.core.telemetry import TelemetryError, parse_telemetry_file
from gyroflow_tpu.core.telemetry import canon_ctmd as cc

FPS = 30.0
RATE = 1000.0
W, H = 320, 240
N_FRAMES = 12


def make_sample(i):
    t0 = i * 1000.0 / FPS
    n = int(round(RATE / FPS))
    imu = [(t0 + j / RATE * 1000.0,
            20.0 * math.sin((t0 + j) * 0.01), -8.0, 2.0,      # gyro deg/s
            0.0, 0.0, 9.81) for j in range(n)]                # accl
    tag_map = {
        "lens": {"focal_length": 24.0,
                 "pixel_focal_length": [1111.0, 1111.0],
                 "display_name": "RF24-70mm F2.8 L IS USM",
                 "distortion": [0.01, -0.002, 0.0003, 0.0, 0.0, 0.0,
                                1e-4, -2e-4],
                 "enabled_corrections": [1, 1, 0, 1]},
        "imager": {"pixel_width": W, "pixel_height": H,
                   "exposure_time": 8.0},
    }
    return cc.build_ctmd_sample(tag_map, imu_samples=imu, sample_rate=RATE,
                                camera_model="EOS R5 C",
                                imu_orientation="xyz",
                                frame_readout_time=12.0)


@pytest.fixture(scope="module")
def ctmd_mp4(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("canon") / "canon.mp4")
    data = cc.build_ctmd_mp4([make_sample(i) for i in range(N_FRAMES)], FPS)
    open(p, "wb").write(data)
    return p


class TestCTMDParse:
    def test_detect_and_parse(self, ctmd_mp4):
        assert cc.has_canon_ctmd(ctmd_mp4)
        md = parse_telemetry_file(ctmd_mp4, size=(W, H), fps=FPS)
        assert md.detected_source == "Canon EOS R5 C"
        assert len(md.raw_imu) == N_FRAMES * int(RATE / FPS)
        assert md.raw_imu[0].accl is not None
        assert md.imu_orientation == "xyz"
        assert md.frame_readout_time == 12.0
        tm = md.additional_data["tag_map"]
        assert tm["lens"]["focal_length"] == 24.0
        assert tm["imager"]["exposure_time"] == 8.0

    def test_manager_quirks_fire_end_to_end(self, ctmd_mp4):
        """gyro_source/mod.rs:491-499: loading a Canon clip applies the
        time-offset + lens-profile quirks with no pre-parsed metadata."""
        mgr = StabilizationManager()
        mgr.init_from_video_data(N_FRAMES / FPS * 1000.0, FPS, N_FRAMES, (W, H))
        mgr.load_gyro_data(ctmd_mp4)
        fm = mgr.gyro.file_metadata
        assert fm is not None
        # canon.rs:94-100 offset: frame_time + frt/2 - exposure/2 - dt/2
        assert len(fm.per_frame_time_offsets) >= 1
        expected = 1000.0 / FPS + 12.0 / 2 - 8.0 / 2 - (1000.0 / RATE) / 2
        assert abs(fm.per_frame_time_offsets[0] - expected) < 1e-6
        # pixel-focal-length lens profile synthesized (canon.rs lens init)
        assert fm.lens_profile is not None
        assert fm.lens_profile["camera_brand"] == "Canon"
        assert fm.lens_profile["distortion_model"] == "opencv_standard"
        assert fm.lens_profile["fisheye_params"]["camera_matrix"][0][0] == 1111.0
        mgr.recompute_blocking()        # smooths + zooms without error

    def test_unknown_records_and_tags_skipped(self, tmp_path):
        sample = make_sample(0)
        extra = cc._record(99, b"\x00" * 16) + \
            cc._record(cc.REC_FOCAL, cc._tlv(0x7777, b"\x01\x02"))
        data = cc.build_ctmd_mp4([sample + extra], FPS)
        p = tmp_path / "extra.mp4"
        p.write_bytes(data)
        md = parse_telemetry_file(str(p), size=(W, H), fps=FPS)
        assert len(md.raw_imu) > 0        # known content still parsed

    def test_malformed_record_raises(self, tmp_path):
        sample = bytearray(make_sample(0))
        sample[0:4] = (1 << 24).to_bytes(4, "little")   # record size overrun
        data = cc.build_ctmd_mp4([bytes(sample)], FPS)
        p = tmp_path / "bad.mp4"
        p.write_bytes(data)
        with pytest.raises(TelemetryError):
            parse_telemetry_file(str(p), size=(W, H), fps=FPS)

    def test_no_imu_raises(self, tmp_path):
        sample = cc.build_ctmd_sample({"lens": {"focal_length": 50.0}})
        data = cc.build_ctmd_mp4([sample], FPS)
        p = tmp_path / "noimu.mp4"
        p.write_bytes(data)
        with pytest.raises(TelemetryError):
            parse_telemetry_file(str(p), size=(W, H), fps=FPS)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])

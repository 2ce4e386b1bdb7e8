"""Controller-surface manager methods (controller.rs invokables).

estimate_bias (controller.rs:552-570 / gyro_source/mod.rs:979-1002),
set_background_color, get_smoothing_max_angles, quats_at_timestamp,
export_lens_profile.
"""
import json

import numpy as np
import pytest

from test_end_to_end import DUR_S, gcsv_path  # noqa: F401

from gyroflow_tpu.core.lens_profile import LensProfile
from gyroflow_tpu.core.manager import StabilizationManager


@pytest.fixture()
def mgr(gcsv_path):  # noqa: F811
    m = StabilizationManager()
    m.init_from_video_data(duration_ms=DUR_S * 1000.0, fps=30.0,
                           frame_count=int(DUR_S * 30), video_size=(640, 480))
    m.load_gyro_data(str(gcsv_path))
    return m


class TestEstimateBias:
    def test_matches_mean_of_range(self, mgr):
        bias = mgr.estimate_bias([0.5])
        dur = mgr.params.duration_ms
        lo, hi = 0.5 * dur - 200.0, 0.5 * dur + 200.0
        # reference reads the UNtransformed file metadata (mod.rs:985-996)
        rows = [x.gyro for x in mgr.gyro.file_metadata.raw_imu
                if x.gyro is not None and lo < x.timestamp_ms < hi]
        want = -np.mean(np.asarray(rows), axis=0)
        np.testing.assert_allclose(bias, want, atol=1e-9)

    def test_string_form_and_apply(self, mgr):
        bias = mgr.estimate_bias("0.5")
        mgr.set_imu_bias(*bias)
        # applying the estimated bias centers the range's gyro on ~zero
        dur = mgr.params.duration_ms
        lo, hi = 0.5 * dur - 200.0, 0.5 * dur + 200.0
        rows = [x.gyro for x in mgr.gyro.get_raw_imu()
                if x.gyro is not None and lo < x.timestamp_ms < hi]
        assert np.abs(np.mean(np.asarray(rows), axis=0)).max() < 1e-6

    def test_empty(self, mgr):
        assert mgr.estimate_bias([]) == (0.0, 0.0, 0.0)


class TestSmallInvokables:
    def test_set_background_color(self, mgr):
        mgr.set_background_color(0.1, 0.2, 0.3, 0.9)
        assert mgr.params.background == (0.1, 0.2, 0.3, 0.9)

    def test_max_angles_after_recompute(self, mgr):
        mgr.recompute_blocking()
        angles = mgr.get_smoothing_max_angles()
        assert len(angles) == 3
        assert all(np.isfinite(a) and a >= 0.0 for a in angles)

    def test_quats_at_timestamp(self, mgr):
        mgr.recompute_blocking()
        org, smoothed = mgr.quats_at_timestamp(DUR_S * 500.0)
        for q in (org, smoothed):
            assert np.asarray(q).shape[-1] == 4
            assert abs(np.linalg.norm(np.asarray(q)) - 1.0) < 1e-6

    def test_export_lens_profile(self, mgr, tmp_path):
        mgr.lens = LensProfile.from_dict({
            "name": "t", "calibrated_by": "x",
            "camera_brand": "B", "camera_model": "M",
            "calib_dimension": {"w": 640, "h": 480},
            "orig_dimension": {"w": 640, "h": 480},
            "output_dimension": {"w": 640, "h": 480},
            "fisheye_params": {
                "camera_matrix": [[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]],
                "distortion_coeffs": [0.1, -0.02, 0.0, 0.0],
            },
            "calibrator_version": "1.0", "date": "2026-01-01",
        })
        out = tmp_path / "prof.json"
        mgr.export_lens_profile(str(out))
        d = json.loads(out.read_text())
        assert d["camera_brand"] == "B"
        back = LensProfile.from_dict(d)
        assert back.is_valid()

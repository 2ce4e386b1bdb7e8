"""Sync subsystem: OptimSync FFT sync-point picker + optical-flow methods."""
import math

import numpy as np
import pytest

from gyroflow_tpu.core.file_metadata import TimeIMU
from gyroflow_tpu.sync.optimsync import OptimSync, blackman_exact, nlfunc, \
    pick_sync_points_fft


def make_imu(duration_s=30.0, rate=500.0, bursts=((15.0, 1.5, 10.0),), seed=0):
    """Gyro trace: near-still, with (center_s, width_s, freq_hz) shake bursts
    of strong 2-30 Hz content."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * rate)
    t = np.arange(n) / rate
    g = rng.normal(0, 0.4, (n, 3))
    for c, w, f in bursts:
        env = np.exp(-0.5 * ((t - c) / (w / 2)) ** 2)
        g[:, 0] += 120.0 * env * np.sin(2 * np.pi * f * t)
        g[:, 1] += 90.0 * env * np.sin(2 * np.pi * (f * 1.3) * t + 1.0)
    return [TimeIMU(timestamp_ms=ti * 1000.0, gyro=g[i]) for i, ti in enumerate(t)]


class TestOptimSync:
    def test_blackman_exact_endpoints(self):
        w = blackman_exact(101)
        # "exact Blackman" endpoints = (a0 - a1 + a2) = 128/18608, not 0
        assert abs(w[0] - 128.0 / 18608.0) < 1e-6
        assert abs(w[-1] - 128.0 / 18608.0) < 1e-6
        assert abs(w[50] - 1.0) < 1e-2  # peak ~1 at center

    def test_nlfunc(self):
        np.testing.assert_allclose(nlfunc(np.array([0.0, 450.0, 500.0]), 450.0),
                                   [0.0, 0.0, 50.0])

    def test_picks_burst_location(self):
        imu = make_imu(bursts=((15.0, 1.5, 10.0),))
        pts = pick_sync_points_fft(imu, 30000.0, 1)
        assert pts is not None and len(pts) == 1
        assert abs(pts[0] - 15000.0) < 1500.0, pts

    def test_two_bursts_two_points(self):
        imu = make_imu(bursts=((8.0, 1.5, 12.0), (22.0, 1.5, 9.0)))
        pts = sorted(pick_sync_points_fft(imu, 30000.0, 2))
        assert len(pts) == 2
        assert abs(pts[0] - 8000.0) < 1500.0 and abs(pts[1] - 22000.0) < 1500.0, pts

    def test_edges_excluded_for_long_clips(self):
        # burst right at the start of a >12s clip must not be picked
        imu = make_imu(bursts=((0.5, 1.0, 10.0),))
        pts = pick_sync_points_fft(imu, 30000.0, 1)
        assert not pts or pts[0] > 2000.0

    def test_quiet_clip_returns_none(self):
        rng = np.random.default_rng(0)
        imu = [TimeIMU(timestamp_ms=i * 2.0, gyro=rng.normal(0, 0.05, 3))
               for i in range(15000)]
        # rank < 50 everywhere → no usable points
        assert pick_sync_points_fft(imu, 30000.0, 2) is None

    def test_trim_ranges_respected(self):
        imu = make_imu(bursts=((8.0, 1.5, 12.0), (22.0, 1.5, 9.0)))
        pts = pick_sync_points_fft(imu, 30000.0, 2, trim_ranges=[(0.5, 0.99)])
        # only the 22s burst is inside [15s, 29.7s]
        assert pts and all(p > 15000.0 for p in pts), pts

    def test_nms_merges_nearby_peaks(self):
        # two bursts 3s apart (< 8s NMS radius) → only one survives per region
        imu = make_imu(bursts=((14.0, 1.0, 10.0), (17.0, 1.0, 11.0)))
        o = OptimSync(imu)
        pts, rank, ratio = o.run(4, [(0.0, 30.0)])
        close = [p for p in pts if 12000 < p < 19000]
        assert len(close) == 1, pts


def spin_frames(n=8, size=(320, 240), deg_per_frame=1.2, seed=0):
    """Frames of a feature-rich pattern rotating about the image center."""
    import cv2
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (size[1] * 2, size[0] * 2), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 0)
    frames = []
    for i in range(n):
        M = cv2.getRotationMatrix2D((size[0], size[1]), i * deg_per_frame, 1.0)
        img = cv2.warpAffine(base, M, (size[0] * 2, size[1] * 2))
        frames.append(img[size[1] // 2:size[1] // 2 + size[1],
                          size[0] // 2:size[0] // 2 + size[0]].copy())
    return frames


class TestPoseMethods:
    def test_eight_point_3d_scene(self):
        """Eight-point needs parallax (pure rotation is F-degenerate — the
        flow is a homography); verify on a 3D cloud with rotation + baseline."""
        import cv2
        from gyroflow_tpu.sync.pose_estimator import PoseEstimator
        rng = np.random.default_rng(3)
        pts3 = np.c_[rng.uniform(-1, 1, 200), rng.uniform(-1, 1, 200),
                     rng.uniform(4, 8, 200)]
        ang = np.radians(2.0)
        R, _ = cv2.Rodrigues(np.array([0.3 * ang, ang, 0.1 * ang]))
        t = np.array([0.2, 0.05, 0.0])
        p2 = (pts3 @ R.T) + t
        u0 = pts3[:, :2] / pts3[:, 2:]
        u1 = p2[:, :2] / p2[:, 2:]
        got = PoseEstimator._pose_eight_point(u0, u1)
        assert got is not None
        rv, _ = cv2.Rodrigues(got)
        want, _ = cv2.Rodrigues(R)
        np.testing.assert_allclose(rv.reshape(-1), want.reshape(-1), atol=5e-3)

    @pytest.mark.parametrize("pose", ["almeida", "homography"])
    def test_rotation_recovered(self, pose):
        from gyroflow_tpu.core.manager import StabilizationManager
        from gyroflow_tpu.sync.pose_estimator import PoseEstimator

        size = (320, 240)
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 30.0, 30, size)
        mgr.params.size = size
        cp = mgr.get_compute_params()
        est = PoseEstimator(cp, size, pose_method=pose)
        est.almeida_iters = 8   # keep the RANSAC loop test-sized
        fps = 30.0
        for i, f in enumerate(spin_frames(6, size)):
            est.feed_frame(int(i / fps * 1e6), f, fps)
        items = est.recalculate_gyro_data(fps)
        assert len(items) >= 3, f"{pose}: too few pose results"
        gz = np.array([abs(v.gyro[2]) for v in items])
        assert np.median(gz) == pytest.approx(36.0, rel=0.35), \
            f"{pose}: {np.median(gz)}"


class TestOpticalFlowMethods:
    @pytest.mark.parametrize("method", ["pyrlk", "dis", "akaze"])
    def test_rotation_recovered(self, method):
        from gyroflow_tpu.core.manager import StabilizationManager
        from gyroflow_tpu.sync.pose_estimator import PoseEstimator

        size = (320, 240)
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 30.0, 30, size)
        mgr.params.size = size
        cp = mgr.get_compute_params()
        est = PoseEstimator(cp, size, of_method=method)
        fps = 30.0
        for i, f in enumerate(spin_frames(6, size)):
            est.feed_frame(int(i / fps * 1e6), f, fps)
        items = est.recalculate_gyro_data(fps)
        assert len(items) >= 3, f"{method}: too few pose results"
        # in-plane spin → dominant z rate ≈ deg_per_frame * fps = 36 deg/s
        gz = np.array([abs(v.gyro[2]) for v in items])
        assert np.median(gz) == pytest.approx(36.0, rel=0.35), \
            f"{method}: {np.median(gz)}"


class TestDebugOverlayPixels:
    """get_features_pixels / get_opticalflow_pixels / draw_overlays
    (lib.rs:793-876)."""

    def _mgr_with_results(self):
        import numpy as np
        from gyroflow_tpu.core.manager import StabilizationManager
        from gyroflow_tpu.sync.pose_estimator import FrameResult

        class FakeEst:
            size = (320, 240)
            results = {}

        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 30.0, 30, (640, 480))
        p0 = np.array([[10.0, 20.0], [30.0, 40.0]])
        p1 = p0 + 4.0
        est = FakeEst()
        est.results = {
            1_000_000: FrameResult(timestamp_us=1_000_000,
                                   of_points=(p0, p1), next_ts=1_033_333),
            1_033_333: FrameResult(timestamp_us=1_033_333,
                                   of_points=(p0 + 1, p1 + 1),
                                   next_ts=1_066_666),
        }
        mgr.pose_estimator = est
        return mgr

    def test_features_scaled(self):
        mgr = self._mgr_with_results()
        pts = mgr.get_features_pixels(1_000_500, (640, 480))  # within 2 ms
        assert pts == [(20, 40), (60, 80)]                     # x2 ratio
        assert mgr.get_features_pixels(1_500_000) is None      # too far

    def test_opticalflow_lines(self):
        mgr = self._mgr_with_results()
        pxs = mgr.get_opticalflow_pixels(1_000_000, 2, (640, 480))
        assert pxs
        ages = {a for _x, _y, a in pxs}
        assert ages == {0, 1}
        # line endpoints present for the first pair
        xs = [(x, y) for x, y, a in pxs if a == 0]
        assert (20, 40) in xs and (28, 48) in xs

    def test_draw_overlays_fills_canvas(self):
        from gyroflow_tpu.core.drawing import DrawCanvas
        mgr = self._mgr_with_results()
        mgr.params.show_detected_features = True
        mgr.params.show_optical_flow = True
        canvas = DrawCanvas(640, 480, 640, 480)
        mgr.draw_overlays(canvas, 1_000_000)
        assert canvas.has_any_pixels
        assert (canvas.buffer > 0).sum() >= 4

    def test_set_of_method_clears(self):
        mgr = self._mgr_with_results()
        mgr.set_of_method("dis")
        assert mgr.params.of_method == 2
        assert mgr.pose_estimator is None

    def test_calibrator_overlay(self):
        import numpy as np
        from gyroflow_tpu.calibration.calibrator import DetectedPoints, LensCalibrator
        from gyroflow_tpu.core.drawing import DrawCanvas
        mgr = self._mgr_with_results()
        mgr.params.is_calibrator = True
        cal = LensCalibrator(columns=3, rows=2)
        cal.width, cal.height = 640, 480
        pts = np.array([[100.0 + 40 * i, 200.0] for i in range(6)])
        cal.all_matches[30] = DetectedPoints(frame=30, timestamp_us=1_000_000,
                                             points=pts)
        mgr.lens_calibrator = cal
        canvas = DrawCanvas(640, 480, 640, 480)
        mgr.draw_overlays(canvas, 1_000_000)   # frame 30 at 30 fps
        assert canvas.has_any_pixels

    def test_zoom_debug_overlay(self):
        from gyroflow_tpu.core.drawing import DrawCanvas
        mgr = self._mgr_with_results()
        mgr.params.output_size = (640, 480)
        mgr.params.fovs = [1.0] * 40
        mgr.params.zooming_debug_points_map = {
            1_000_000: [(0.25, 0.25), (0.75, 0.75)]}
        canvas = DrawCanvas(640, 480, 640, 480)
        mgr.draw_overlays(canvas, 1_000_000)
        assert canvas.has_any_pixels

"""Lens calibrator: marker-less detection, sharpness gating, synthetic
fisheye calibration recovery, corner overlay drawing."""
import math

import cv2
import numpy as np
import pytest

from gyroflow_tpu.calibration.calibrator import DetectedPoints, LensCalibrator
from gyroflow_tpu.calibration.drawing import draw_chessboard_corners
from gyroflow_tpu.core.drawing import DrawCanvas

COLS, ROWS = 14, 8


def render_board(angle_deg=0.0, scale=1.0, blur=0):
    """Plain checkerboard image (NO center marker) with 14x8 inner corners."""
    sq = 40
    bw, bh = (COLS + 1) * sq, (ROWS + 1) * sq
    board = np.zeros((bh, bw), np.uint8)
    for y in range(ROWS + 1):
        for x in range(COLS + 1):
            if (x + y) % 2 == 0:
                board[y * sq:(y + 1) * sq, x * sq:(x + 1) * sq] = 230
    W, H = 800, 560
    img = np.full((H, W), 128, np.uint8)
    M = cv2.getRotationMatrix2D((bw / 2, bh / 2), angle_deg, scale)
    M[0, 2] += (W - bw) / 2
    M[1, 2] += (H - bh) / 2
    img = cv2.warpAffine(board, M, (W, H), img.copy(),
                         borderMode=cv2.BORDER_TRANSPARENT)
    if blur:
        img = cv2.GaussianBlur(img, (blur | 1, blur | 1), 0)
    return img


class TestDetection:
    def test_markerless_board_detected(self):
        cal = LensCalibrator(no_marker=True)
        ok = cal.feed_frame(0, 0, render_board(3.0, 0.9))
        assert ok
        assert len(cal.image_points[0].points) == COLS * ROWS

    def test_markerless_fallback_without_flag(self):
        """Even with no_marker=False the plain-flag fallback finds the board
        (calibration/mod.rs 'no marker' path)."""
        cal = LensCalibrator(no_marker=False)
        assert cal.feed_frame(0, 0, render_board(-4.0, 0.85))

    def test_blurry_frame_rejected_unless_forced(self):
        cal = LensCalibrator(no_marker=True, max_sharpness=1.2)
        ok = cal.feed_frame(0, 1, render_board(2.0, 0.9, blur=9))
        if 1 in cal.all_matches:   # detector may reject outright; if detected:
            assert not ok or cal.all_matches[1].avg_sharpness < 1.2
            if not ok:
                cal2 = LensCalibrator(no_marker=True, max_sharpness=1.2)
                cal2.forced_frames.add(1)
                assert cal2.feed_frame(0, 1, render_board(2.0, 0.9, blur=9))

    def test_detection_cache_reused(self):
        cal = LensCalibrator(no_marker=True)
        img = render_board(3.0, 0.9)
        assert cal.feed_frame(0, 0, img)
        before = cal.all_matches[0]
        assert cal.feed_frame(0, 0, img)
        assert cal.all_matches[0] is before


class TestCalibration:
    def test_recovers_synthetic_fisheye(self):
        """Project the board grid through a known fisheye; calibrate() must
        recover K within a few pixels (mod.rs:205-310 subset search)."""
        rng = np.random.default_rng(0)
        W, H = 1280, 960
        K = np.array([[720.0, 0, W / 2], [0, 720.0, H / 2], [0, 0, 1.0]])
        D = np.array([0.05, -0.01, 0.002, -0.0005])
        objp = np.array([(x, y, 0.0) for y in range(ROWS) for x in range(COLS)],
                        np.float64)
        cal = LensCalibrator()
        cal.width, cal.height = W, H
        for f in range(8):
            rvec = rng.normal(0, 0.25, 3)
            tvec = np.array([rng.normal(-7, 1), rng.normal(-4, 1),
                             rng.uniform(16, 26)])
            pts, _ = cv2.fisheye.projectPoints(
                objp.reshape(1, -1, 3), rvec, tvec, K, D)
            pts = pts.reshape(-1, 2)
            if not ((pts > 0) & (pts < [W, H])).all():
                continue
            cal.image_points[f] = DetectedPoints(f, f * 33000, pts, 0.5)
        assert len(cal.image_points) >= 4
        rms = cal.calibrate()
        assert rms < 1.0
        assert abs(cal.k[0, 0] - 720.0) < 10.0
        assert abs(cal.k[0, 2] - W / 2) < 10.0

    def test_end_to_end_markerless_calibrate(self):
        """Detect on rendered marker-less boards then calibrate (pinhole-ish
        scene: near-zero distortion expected)."""
        cal = LensCalibrator(no_marker=True, max_sharpness=50.0)
        fed = 0
        for f, (ang, sc) in enumerate([(0, .9), (5, .85), (-5, .95), (9, .8),
                                       (-9, .88), (3, 1.0)]):
            if cal.feed_frame(f * 33000, f, render_board(ang, sc)):
                fed += 1
        assert fed >= 4
        rms = cal.calibrate()
        assert math.isfinite(rms)
        prof = cal.to_lens_profile("Test", "Cam")
        assert prof.fisheye_params.camera_matrix[0][0] > 0


class TestDrawing:
    def test_overlay_draws_found_and_notfound(self):
        canvas = DrawCanvas(200, 140, 200, 140)
        corners = [(20.0 + 10 * c, 20.0 + 12 * r)
                   for r in range(ROWS) for c in range(COLS)]
        draw_chessboard_corners(200, 140, canvas, (COLS, ROWS), corners, True)
        assert (canvas.buffer > 0).sum() > 200
        canvas2 = DrawCanvas(200, 140, 200, 140)
        draw_chessboard_corners(200, 140, canvas2, (COLS, ROWS), corners[:5],
                                False)
        assert (canvas2.buffer > 0).sum() > 20

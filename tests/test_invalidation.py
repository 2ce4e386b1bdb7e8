"""Invalidation contract (VERDICT r3 #2; lib.rs:94-99, 663, 691, 904-915).

The facade must behave like the reference's checksum-gated recompute:
 - a setter followed directly by process_pixels reflects the change (lazy
   blocking recompute, lib.rs:904-915) — no manual recompute_blocking needed;
 - a zoom-only change does NOT re-run the 6-pass smoothing scan
   (smoothing_checksum gating, lib.rs:663);
 - a pixel-only / no-op change skips the FOV solve too (zooming_checksum,
   lib.rs:691).
"""
import numpy as np
import pytest

from gyroflow_tpu.core.keyframes import KeyframeType
from gyroflow_tpu.core.lens_profile import CameraParams, Dimensions, LensProfile
from gyroflow_tpu.core.manager import StabilizationManager

from test_end_to_end import gcsv_path, DUR_S, W, H  # noqa: F401 (fixture)


@pytest.fixture()
def mgr(gcsv_path):  # noqa: F811
    m = StabilizationManager()
    m.init_from_video_data(DUR_S * 1000.0, 30.0, int(DUR_S * 30), (W, H))
    m.lens = LensProfile(
        calib_dimension=Dimensions(W, H),
        fisheye_params=CameraParams(
            camera_matrix=[[W * 0.6, 0, W / 2], [0, W * 0.6, H / 2], [0, 0, 1]],
            distortion_coeffs=[0.25, -0.05, 0.01, -0.001]),
        distortion_model="opencv_fisheye")
    m.lens.init()
    m.params.frame_readout_time = 8.0
    m.load_gyro_data(gcsv_path)
    m.recompute_blocking()
    return m


def _render(m, ts_us=500_000):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (H, W, 1)).astype(np.float32)
    out, _ = m.process_pixels(ts_us, img, interpolation=2, use_pallas=False)
    return np.asarray(out)


def _count_calls(monkeypatch, m):
    """Instrument the two expensive stages with call counters."""
    counts = {"smooth": 0, "zoom": 0}
    orig_s = StabilizationManager.recompute_smoothness
    orig_z = StabilizationManager.recompute_adaptive_zoom

    def smooth(self):
        counts["smooth"] += 1
        return orig_s(self)

    def zoom(self):
        counts["zoom"] += 1
        return orig_z(self)

    monkeypatch.setattr(StabilizationManager, "recompute_smoothness", smooth)
    monkeypatch.setattr(StabilizationManager, "recompute_adaptive_zoom", zoom)
    return counts


class TestLazyRecompute:
    def test_smoothing_param_reflected_without_manual_recompute(self, mgr):
        """lib.rs:904-915: set_smoothing_param -> process_pixels must render
        with the NEW smoothed quats, not stale ones."""
        base = _render(mgr)
        mgr.set_smoothing_param("smoothness", 3.0)   # much heavier smoothing
        lazy = _render(mgr)
        assert not np.allclose(lazy, base), \
            "process_pixels served stale smoothing after set_smoothing_param"
        # and the lazy result must equal an explicit blocking recompute
        mgr.set_smoothing_param("smoothness", 0.1)
        mgr2_out = _render(mgr)            # lazy path
        mgr.invalidate_smoothing()
        mgr.recompute_blocking()
        explicit = _render(mgr)
        np.testing.assert_allclose(mgr2_out, explicit)

    def test_horizon_lock_reflected(self, mgr):
        base = _render(mgr)
        mgr.set_horizon_lock(100.0, 30.0)
        out = _render(mgr)
        assert not np.allclose(out, base)

    def test_window_path_lazy_recompute(self, mgr):
        """process_pixels_window performs the same lazy recompute."""
        import jax
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
        rng = np.random.default_rng(0)
        frames = rng.uniform(0, 255, (2, H, W, 1)).astype(np.float32)
        out0, _ = mgr.process_pixels_window([0, 33_366], frames, mesh,
                                            interpolation=2, use_pallas=False)
        mgr.set_smoothing_param("smoothness", 3.0)
        out1, _ = mgr.process_pixels_window([0, 33_366], frames, mesh,
                                            interpolation=2, use_pallas=False)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))


class TestChecksumGating:
    def test_zoom_only_change_skips_smoothing(self, mgr, monkeypatch):
        """lib.rs:663 counter-assert: set_adaptive_zoom re-runs the FOV solve
        but NOT the smoothing scan."""
        counts = _count_calls(monkeypatch, mgr)
        mgr.set_adaptive_zoom(2.0)
        _render(mgr)
        assert counts["smooth"] == 0, "zoom-only change re-ran smoothing"
        assert counts["zoom"] == 1

    def test_zooming_center_skips_smoothing(self, mgr, monkeypatch):
        counts = _count_calls(monkeypatch, mgr)
        mgr.set_zooming_center_x(0.2)
        mgr.set_zooming_center_y(-0.1)
        _render(mgr)
        assert counts["smooth"] == 0
        assert counts["zoom"] == 1

    def test_repeated_recompute_skips_both(self, mgr, monkeypatch):
        """recompute_blocking with no intervening setter re-runs neither scan
        (the reference's recompute_threaded checksum semantics); an explicit
        blanket invalidate() zeroes the checksums and forces both, exactly
        like lib.rs invalidate_smoothing storing 0."""
        counts = _count_calls(monkeypatch, mgr)
        mgr.recompute_blocking()
        mgr.recompute_blocking()
        _render(mgr)
        assert counts == {"smooth": 0, "zoom": 0}
        mgr.invalidate()
        _render(mgr)
        assert counts == {"smooth": 1, "zoom": 1}

    def test_smoothing_change_reruns_both(self, mgr, monkeypatch):
        counts = _count_calls(monkeypatch, mgr)
        mgr.set_smoothing_param("smoothness", 1.7)
        _render(mgr)
        assert counts["smooth"] >= 1
        assert counts["zoom"] >= 1   # smoothing_changed forces the FOV solve

    def test_zoom_keyframe_routes_to_zooming(self, mgr, monkeypatch):
        counts = _count_calls(monkeypatch, mgr)
        mgr.set_keyframe(KeyframeType.ZoomingSpeed, 100_000, 1.5)
        _render(mgr)
        assert counts["smooth"] == 0
        assert counts["zoom"] == 1

    def test_smoothing_keyframe_routes_to_smoothing(self, mgr, monkeypatch):
        counts = _count_calls(monkeypatch, mgr)
        mgr.set_keyframe(KeyframeType.SmoothingParamSmoothness, 100_000, 2.0)
        _render(mgr)
        assert counts["smooth"] == 1

    def test_steady_state_render_is_flagless(self, mgr, monkeypatch):
        counts = _count_calls(monkeypatch, mgr)
        for i in range(3):
            _render(mgr, ts_us=i * 33_366)
        assert counts == {"smooth": 0, "zoom": 0}

    def test_threaded_recompute_gated(self, mgr, monkeypatch):
        import time
        counts = _count_calls(monkeypatch, mgr)
        done = []
        mgr.set_adaptive_zoom(1.5)
        mgr.recompute_threaded(cb=done.append)
        for _ in range(200):
            if done:
                break
            time.sleep(0.02)
        assert done, "threaded recompute never completed"
        assert counts["smooth"] == 0
        assert counts["zoom"] == 1

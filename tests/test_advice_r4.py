"""Regression tests for the round-4 advisor findings (ADVICE.md r4).

1. medium — manager.frame_transform_at's _stab_cache is shared between the
   render main loop and the decode-ahead prefetch thread; unguarded
   check/evict/insert raced (double-pop KeyError / RuntimeError).
2. low — a prefetch running with stale ComputeParams must not repopulate
   the cache after an invalidation (silently stale geometry).
3. low — near-singular new_k must fall back to an epsilon pseudo-inverse
   (reference: (new_k*r).pseudo_inverse(1e-6), frame_transform.rs:296)
   instead of producing huge unclamped values.
"""
import threading

import numpy as np

from gyroflow_tpu.core.lens_profile import CameraParams, Dimensions, LensProfile
from gyroflow_tpu.core.manager import StabilizationManager

from test_end_to_end import gcsv_path, DUR_S, W, H  # noqa: F401 (fixture)


def _make_mgr(gcsv_path):  # noqa: F811
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


def test_frame_transform_cache_thread_hammer(gcsv_path):  # noqa: F811
    """Two threads walking overlapping timestamp ranges with eviction
    pressure (>256 distinct keys) must never raise. Pre-fix this
    KeyError'd/RuntimeError'd within a few hundred iterations."""
    m = _make_mgr(gcsv_path)
    errs = []

    def worker(start_ms):
        try:
            for i in range(400):
                ts = start_ms + (i % 320) * 3.0
                ft = m.frame_transform_at(ts)
                assert ft.matrices.shape[1] == 14
        except Exception as e:  # noqa: BLE001 — the test IS the absence of this
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in (0.0, 50.0)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert len(m._stab_cache) <= 256


def test_stale_prefetch_does_not_repopulate(gcsv_path):  # noqa: F811
    """A frame_transform_at computed against pre-invalidation params must
    not be inserted into the cache after invalidate_undistortion ran
    (the decode-ahead prefetch race, ADVICE r4 low #1)."""
    m = _make_mgr(gcsv_path)
    from gyroflow_tpu.ops import frame_transform as ftmod

    orig = ftmod.frame_transform_at
    started = threading.Event()
    release = threading.Event()

    def slow_ft(cp, ts, frame):
        started.set()
        release.wait(timeout=10.0)
        return orig(cp, ts, frame)

    result = {}

    def prefetch():
        # patch only inside this thread's call window
        ftmod_frame_transform_at = slow_ft
        from gyroflow_tpu.core import manager as mgrmod  # noqa: F401
        import gyroflow_tpu.ops.frame_transform as f
        f_orig = f.frame_transform_at
        f.frame_transform_at = ftmod_frame_transform_at
        try:
            result["ft"] = m.frame_transform_at(123.0)
        finally:
            f.frame_transform_at = f_orig

    t = threading.Thread(target=prefetch)
    t.start()
    assert started.wait(timeout=10.0)
    # invalidate while the prefetch is mid-compute
    m.invalidate_undistortion()
    release.set()
    t.join()
    assert result["ft"] is not None           # the caller still gets a value
    key = int(round(123.0 * 1000.0))
    assert key not in m._stab_cache           # but the stale insert was skipped


def test_near_singular_new_k_uses_pseudo_inverse(gcsv_path):  # noqa: F811
    """Degenerate fov -> near-singular new_k: matrices must stay finite and
    bounded (epsilon pseudo-inverse semantics), not explode to ~1/eps."""
    m = _make_mgr(gcsv_path)
    # a huge fov collapses new_k's focal entries toward 0 (get_new_k divides
    # focal by fov): cond(new_k) ~ 8e12, singular value ~1e-10 <= the 1e-6
    # epsilon, so the reference's pseudo_inverse truncates it to 0 while a
    # plain inverse would produce ~1e10-scale entries
    m.params.fov_scale = 1e13
    m.invalidate_undistortion()
    ft = m.frame_transform_at(100.0)
    assert np.isfinite(ft.matrices).all()
    assert np.abs(ft.matrices).max() < 1e9

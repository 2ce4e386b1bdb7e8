"""rs-sync / visual-features offset solvers (find_offset/rs_sync.rs,
visual_features.rs): synthetic point-pair recovery within 1 ms."""
import math

import numpy as np
import pytest

from test_end_to_end import gcsv_path, DUR_S  # noqa: F401

from gyroflow_tpu.core.manager import StabilizationManager
from gyroflow_tpu.ops.frame_transform import get_lens_data_at_timestamp
from gyroflow_tpu.core import quaternion as quat
from gyroflow_tpu.sync.find_offset import (RsSyncProblem, collect_matched_points,
                                           find_offsets_rs_sync,
                                           find_offsets_visual_features,
                                           guess_orientation)
from gyroflow_tpu.sync.pose_estimator import FrameResult, PoseEstimator

VW, VH, FPS = 640, 480, 30.0
TRUE_OFFSET_MS = 47.0


def make_manager(gcsv):
    mgr = StabilizationManager()
    mgr.init_from_video_data(DUR_S * 1000.0, FPS, int(DUR_S * FPS), (VW, VH))
    mgr.load_gyro_data(gcsv)
    mgr.lens.global_shutter = True
    mgr.recompute_blocking()
    return mgr


def synth_estimator(mgr, offset_ms: float, frames=range(8, 30)):
    """Generate OF point pairs consistent with the gyro at a known offset.

    World directions are fixed (static scene at infinity); each frame's rays
    come from rotating them by the camera orientation at (video_ts - offset),
    using the same quaternion convention as the solver."""
    params = mgr.get_compute_params()
    est = PoseEstimator(params, (VW, VH))
    problem = RsSyncProblem.__new__(RsSyncProblem)  # only for _sync_quat_at
    problem.gyro = params.gyro

    K, *_ = get_lens_data_at_timestamp(params, 100.0, False)
    K = np.asarray(K, np.float64)

    # grid of normalized coords in the central frame region
    gx, gy = np.meshgrid(np.linspace(-0.25, 0.25, 6), np.linspace(-0.2, 0.2, 5))
    n0 = np.stack([gx.ravel(), gy.ravel()], axis=1)          # (N, 2)
    rays0 = np.concatenate([n0, np.ones((len(n0), 1))], 1)
    rays0 /= np.linalg.norm(rays0, axis=1, keepdims=True)

    def rays_to_pixels(r):
        n = r[:, :2] / r[:, 2:3]
        return np.stack([K[0, 0] * n[:, 0] + K[0, 2],
                         K[1, 1] * n[:, 1] + K[1, 2]], axis=1)

    frame_ts_us = [int(i / FPS * 1e6) for i in frames]
    q_mid = problem._sync_quat_at(np.asarray([frame_ts_us[0] / 1e3 - offset_ms]))[0]
    world = quat.rotate_vector(q_mid[None, :], rays0)        # static world dirs

    pix = {}
    for ts_us in frame_ts_us:
        q = problem._sync_quat_at(np.asarray([ts_us / 1e3 - offset_ms]))[0]
        cam = quat.rotate_vector(quat.conjugate(q)[None, :], world)
        pix[ts_us] = rays_to_pixels(cam)

    for a, b in zip(frame_ts_us[:-1], frame_ts_us[1:]):
        est.results[a] = FrameResult(a, of_points=(pix[a], pix[b]), next_ts=b,
                                     points=len(pix[a]))
    return est, (frame_ts_us[0], frame_ts_us[-1] + 1)


class TestRsSync:
    def test_recovers_offset_within_1ms(self, gcsv_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, TRUE_OFFSET_MS)
        offs = find_offsets_rs_sync(mgr, est, [rng], initial_offset=0.0,
                                    search_size=300.0)
        assert offs, "no offset found"
        _ts, offset, cost = offs[0]
        assert abs(offset - TRUE_OFFSET_MS) < 1.0, (offset, cost)

    def test_initial_guess_narrows_search(self, gcsv_path):  # noqa: F811
        """With an essential-matrix seed, the true offset is found even when
        the raw search window would not contain it."""
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, TRUE_OFFSET_MS)
        offs = find_offsets_rs_sync(mgr, est, [rng], initial_offset=0.0,
                                    search_size=10.0,       # too small alone
                                    initial_from_essential=40.0)
        assert offs
        assert abs(offs[0][1] - TRUE_OFFSET_MS) < 1.0

    def test_cost_minimum_at_true_offset(self, gcsv_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, TRUE_OFFSET_MS)
        problem = RsSyncProblem(mgr.get_compute_params(), est, *rng)
        c_true = problem.cost(TRUE_OFFSET_MS)
        assert c_true < problem.cost(TRUE_OFFSET_MS + 30.0)
        assert c_true < problem.cost(TRUE_OFFSET_MS - 30.0)
        assert c_true < 1e-6

    def test_prior_offsets_do_not_shift_the_solution(self, gcsv_path):  # noqa: F811
        """A previously-applied sync offset must not be double-counted:
        the solver works on the raw gyro clock, so a second sync point still
        recovers the ABSOLUTE offset (rs_sync.rs solves raw timestamps)."""
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, TRUE_OFFSET_MS)
        mgr.set_sync_offset(rng[0], TRUE_OFFSET_MS)   # as if point 1 applied
        offs = find_offsets_rs_sync(mgr, est, [rng], initial_offset=0.0,
                                    search_size=300.0)
        assert offs
        assert abs(offs[0][1] - TRUE_OFFSET_MS) < 1.0, offs[0]

    def test_out_of_range_rejected(self, gcsv_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, 400.0)
        offs = find_offsets_rs_sync(mgr, est, [rng], initial_offset=0.0,
                                    search_size=100.0)
        assert offs == []   # |offset| beyond 90% of search window


class TestVisualFeatures:
    def test_finds_offset_smoke(self, gcsv_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, 10.0)
        offs = find_offsets_visual_features(mgr, est, [rng],
                                            initial_offset=0.0,
                                            search_size=60.0)
        assert isinstance(offs, list)
        if offs:   # cost landscape exists; value depends on lens model
            assert abs(offs[0][1]) < 60.0

    def test_rs_estimation_mode(self, gcsv_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, 0.0, frames=range(8, 14))
        offs = find_offsets_visual_features(mgr, est, [rng],
                                            initial_offset=0.0,
                                            search_size=30.0, for_rs=True)
        assert len(offs) == 1
        ts, readout, cost = offs[0]
        assert ts == 0.0
        # grid spans +-(1000/fps); the 0.01 ms refinement may step 1 ms past
        assert abs(readout) <= 1000.0 / FPS + 1.0


class TestGuessOrientation:
    def test_identity_orientation_wins(self, gcsv_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, 0.0, frames=range(8, 16))
        res = guess_orientation(mgr, est, [rng], search_size=60.0)
        assert res is not None
        orient, cost = res
        # the generating orientation (the gcsv default) must score best;
        # allow its sign-equivalent aliases
        assert orient.lower() == "xyz", (orient, cost)


class TestCollect:
    def test_collect_matched_points_range(self, gcsv_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        est, rng = synth_estimator(mgr, 0.0, frames=range(8, 12))
        pts = collect_matched_points(est, *rng)
        assert len(pts) == 3
        pts2 = collect_matched_points(est, rng[0], rng[0] + 1)
        assert len(pts2) == 1

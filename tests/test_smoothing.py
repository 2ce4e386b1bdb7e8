import math

import numpy as np
import pytest

from gyroflow_tpu.core import quaternion as quat
from gyroflow_tpu.core.keyframes import KeyframeManager, KeyframeType
from gyroflow_tpu.core.params import ComputeParams
from gyroflow_tpu.core.smoothing import (DefaultAlgo, Fixed, HorizonLock, NoSmoothing,
                                         Plain, Smoothing, get_max_angles,
                                         get_trimmed_quats)
from gyroflow_tpu.core.time_quat import TimeQuat


def shaky_path(n=2000, rate_hz=500.0, seed=0):
    """Random-walk camera path at rate_hz with jitter."""
    rng = np.random.default_rng(seed)
    dt = 1.0 / rate_hz
    ts = (np.arange(n) * dt * 1e6).astype(np.int64)
    rv = rng.normal(0, 0.02, (n, 3)) + np.array([0.001, 0.002, 0.0005])
    qs = np.empty((n, 4))
    q = quat.identity()
    for i in range(n):
        q = quat.multiply(q, quat.from_rotvec(rv[i]))
        qs[i] = q
    return TimeQuat(ts, qs), n * dt * 1000.0


def make_cp(duration_ms, **kw):
    cp = ComputeParams()
    cp.scaled_duration_ms = duration_ms
    cp.scaled_fps = 30.0
    cp.video_speed_affects_smoothing = True
    for k, v in kw.items():
        setattr(cp, k, v)
    return cp


class TestAlgorithms:
    def test_none_passthrough(self):
        tq, dur = shaky_path(200)
        out = NoSmoothing().smooth(tq, dur, make_cp(dur))
        assert np.allclose(out.quats, tq.quats)

    def test_plain_reduces_jitter(self):
        tq, dur = shaky_path()
        out = Plain().smooth(tq, dur, make_cp(dur))
        assert len(out) == len(tq)
        # unit quaternions
        assert np.allclose(np.linalg.norm(out.quats, axis=-1), 1.0)
        # smoothed path has lower angular velocity variance
        def vel_var(t):
            d = quat.angle_of(quat.multiply(quat.inverse(t.quats[:-1]), t.quats[1:]))
            return d.var()
        assert vel_var(out) < vel_var(tq) * 0.5

    def test_default_algo(self):
        tq, dur = shaky_path()
        out = DefaultAlgo().smooth(tq, dur, make_cp(dur))
        assert len(out) == len(tq)
        assert np.allclose(np.linalg.norm(out.quats, axis=-1), 1.0)
        def vel_var(t):
            d = quat.angle_of(quat.multiply(quat.inverse(t.quats[:-1]), t.quats[1:]))
            return d.var()
        assert vel_var(out) < vel_var(tq) * 0.5

    def test_default_algo_per_axis(self):
        tq, dur = shaky_path(800)
        alg = DefaultAlgo()
        alg.per_axis = True
        out = alg.smooth(tq, dur, make_cp(dur))
        assert np.allclose(np.linalg.norm(out.quats, axis=-1), 1.0)

    def test_fixed(self):
        tq, dur = shaky_path(100)
        alg = Fixed()
        alg.roll = 10.0
        out = alg.smooth(tq, dur, make_cp(dur))
        # all quats identical
        assert np.allclose(out.quats, out.quats[0])

    def test_keyframed_time_constant(self):
        tq, dur = shaky_path(500)
        cp = make_cp(dur)
        cp.keyframes.set(KeyframeType.SmoothingParamTimeConstant, 0, 0.1)
        cp.keyframes.set(KeyframeType.SmoothingParamTimeConstant, int(dur * 500), 2.0)
        out = Plain().smooth(tq, dur, cp)
        assert np.allclose(np.linalg.norm(out.quats, axis=-1), 1.0)


class TestTrimRange:
    def test_outside_held(self):
        tq, dur = shaky_path(1000)
        trimmed = get_trimmed_quats(tq, dur, True, [(0.25, 0.75)])
        a = int(0.25 * dur * 1000)
        # before range: constant = quat at range start
        pre = trimmed.timestamps_us < a
        i0 = np.searchsorted(tq.timestamps_us, a)
        assert np.allclose(trimmed.quats[pre], tq.quats[i0])
        # inside range unchanged
        inside = (trimmed.timestamps_us >= a) & (trimmed.timestamps_us <= int(0.75 * dur * 1000))
        assert np.allclose(trimmed.quats[inside], tq.quats[inside])

    def test_between_ranges_slerped(self):
        tq, dur = shaky_path(1000)
        trimmed = get_trimmed_quats(tq, dur, True, [(0.1, 0.3), (0.7, 0.9)])
        gap = (trimmed.timestamps_us > int(0.3 * dur * 1000)) & \
              (trimmed.timestamps_us < int(0.7 * dur * 1000))
        assert gap.any()
        assert np.allclose(np.linalg.norm(trimmed.quats[gap], axis=-1), 1.0)
        # monotone interpolation: no jitter in the gap
        d = quat.angle_of(quat.multiply(quat.inverse(trimmed.quats[gap][:-1]),
                                        trimmed.quats[gap][1:]))
        assert d.max() < 0.01


class TestHorizonLock:
    def test_roll_removed(self):
        # path with constant roll oscillation
        n = 500
        ts = (np.arange(n) * 2000).astype(np.int64)
        base = Fixed()
        base.roll = 0.0
        rolls = 0.3 * np.sin(np.arange(n) * 0.05)
        from gyroflow_tpu.core.smoothing.fixed import quat_for_rpy
        qs = np.stack([quat.multiply(quat_for_rpy(0, 0, 0),
                                     quat.from_axis_angle(np.array([0.0, 0, 1.0]), r))
                       for r in rolls])
        tq = TimeQuat(ts, qs)
        hl = HorizonLock()
        hl.set_horizon(100.0, 0.0)
        out = hl.lock(tq.copy(), tq, None, False, make_cp(1000.0))
        # after lock, quats should be nearly constant (roll removed)
        d = quat.angle_of(quat.multiply(quat.inverse(out.quats[:-1]), out.quats[1:]))
        assert d.max() < 1e-6, d.max()

    def test_zero_percent_noop(self):
        tq, dur = shaky_path(100)
        hl = HorizonLock()
        hl.set_horizon(0.0, 0.0)
        out = hl.lock(tq.copy(), tq, None, False, make_cp(dur))
        assert np.allclose(out.quats, tq.quats)

    def test_partial_lock_is_blend(self):
        tq, dur = shaky_path(100)
        hl_full = HorizonLock(); hl_full.set_horizon(100.0, 0.0)
        hl_half = HorizonLock(); hl_half.set_horizon(50.0, 0.0)
        full = hl_full.lock(tq.copy(), tq, None, False, make_cp(dur))
        half = hl_half.lock(tq.copy(), tq, None, False, make_cp(dur))
        a_full = quat.angle_between(tq.quats, full.quats)
        a_half = quat.angle_between(tq.quats, half.quats)
        assert (a_half <= a_full + 1e-9).all()


class TestFacade:
    def test_registry_order(self):
        s = Smoothing()
        assert s.get_names() == ["No smoothing", "Default", "Plain 3D", "Fixed camera"]
        assert s.current_id == 1

    def test_max_angles(self):
        tq, dur = shaky_path(300)
        smoothed = Plain().smooth(tq, dur, make_cp(dur))
        p, y, r = get_max_angles(tq, smoothed, make_cp(dur))
        assert p >= 0 and y >= 0 and r >= 0
        assert max(p, y, r) > 0.01  # there IS deviation

    def test_clone_preserves_params(self):
        s = Smoothing()
        s.current.set_parameter("smoothness", 0.9)
        c = s.clone()
        assert c.current.get_parameter("smoothness") == 0.9


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestGlitchRepair:
    def test_repairs_spike(self):
        from gyroflow_tpu.core.filtering import GlitchRepairParams, repair_quats
        tq, dur = shaky_path(3000, rate_hz=1000.0)
        # inject a violent glitch: a few samples rotated far off the path
        bad = quat.multiply(tq.quats[1500], quat.from_axis_angle(np.array([0.0, 0, 1]), 2.5))
        orig = tq.quats[1498:1504].copy()
        tq.quats[1499:1502] = bad
        patched = repair_quats(tq, GlitchRepairParams.from_strength(50.0))
        assert patched >= 3
        # repaired samples interpolate smoothly: small angle to neighbors
        d = quat.angle_of(quat.multiply(quat.inverse(tq.quats[1498]), tq.quats[1501]))
        assert d < 0.1, d

    def test_no_false_positive_on_smooth_path(self):
        from gyroflow_tpu.core.filtering import GlitchRepairParams, repair_quats
        tq, dur = shaky_path(2000, rate_hz=1000.0)
        before = tq.quats.copy()
        patched = repair_quats(tq, GlitchRepairParams.from_strength(50.0))
        assert patched == 0
        assert np.allclose(tq.quats, before)

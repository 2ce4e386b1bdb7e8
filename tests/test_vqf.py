"""VQF integrator tests."""
import math

import numpy as np
import pytest

from gyroflow_tpu.core import quaternion as quat
from gyroflow_tpu.core.file_metadata import TimeIMU
from gyroflow_tpu.core.imu_integration.vqf import (VQF, VQFParams, integrate_vqf,
                                                   mat3_inv, offline_vqf)


def make_imu(n=2000, rate=500.0, yaw_rate_dps=30.0, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        t_ms = i * 1000.0 / rate
        gyro = np.array([rng.normal(0, 2.0), rng.normal(0, 2.0),
                         yaw_rate_dps + rng.normal(0, 2.0)])
        accl = np.array([rng.normal(0, 0.2), rng.normal(0, 0.2),
                         9.81 + rng.normal(0, 0.2)])
        out.append(TimeIMU(timestamp_ms=t_ms, gyro=gyro, accl=accl))
    return out, n / rate * 1000.0


class TestVQFMath:
    def test_mat3_inv(self):
        rng = np.random.default_rng(0)
        m = rng.standard_normal((3, 3)) + np.eye(3) * 3
        inv = np.asarray(mat3_inv(list(m.flatten()))).reshape(3, 3)
        assert np.allclose(inv @ m, np.eye(3), atol=1e-10)

    def test_realtime_gravity_alignment(self):
        # static IMU: 6D quat must rotate accel to +Z (earth)
        vqf = VQF(VQFParams(), 1.0 / 500.0)
        for _ in range(2000):
            vqf.update([0.0, 0.0, 0.0], [1.0, 0.0, 9.75])
        q = vqf.get_quat6d()
        up = np.asarray(__import__("gyroflow_tpu.core.imu_integration.vqf",
                                   fromlist=["quat_rotate"]).quat_rotate(q, [1.0, 0.0, 9.75]))
        up = up / np.linalg.norm(up)
        assert up[2] > 0.999, up

    def test_rest_detection_and_bias(self):
        vqf = VQF(VQFParams(), 1.0 / 500.0)
        bias_true = 0.01  # rad/s constant bias on x
        for _ in range(4000):
            vqf.update([bias_true, 0.0, 0.0], [0.0, 0.0, 9.81])
        assert vqf.rest_detected
        assert abs(vqf.bias[0] - bias_true) < 0.005


class TestOfflineVQF:
    def test_constant_rotation_rate(self):
        imu, dur = make_imu(yaw_rate_dps=30.0)
        tq = integrate_vqf(imu, dur)
        assert len(tq) == len(imu)
        assert np.allclose(np.linalg.norm(tq.quats, axis=1), 1.0)
        # body z-rotation of 30 deg/s -> after remap (-y,x,z) still a steady
        # yaw advance; total angle between first and last ~ duration * rate
        total = quat.angle_between(tq.quats[100], tq.quats[-100])
        expected = math.radians(30.0) * (len(imu) - 200) / 500.0
        # angle wraps at pi; compare against wrapped expectation
        wrapped = abs(((expected + math.pi) % (2 * math.pi)) - math.pi)
        assert abs(total - wrapped) < 0.12, (total, wrapped)

    def test_static_is_stable(self):
        imu, dur = make_imu(n=1500, yaw_rate_dps=0.0)
        tq = integrate_vqf(imu, dur)
        # after settling, orientation should drift very little
        drift = quat.angle_between(tq.quats[700], tq.quats[-1])
        assert drift < 0.05, drift

    def test_empty(self):
        assert len(integrate_vqf([], 0.0)) == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestAhrsIntegrators:
    """Mahony/Madgwick (imu_integration/mod.rs:234-330)."""

    @staticmethod
    def _imu(n=2000, rate=500.0, rate_deg=10.0):
        from gyroflow_tpu.core.file_metadata import TimeIMU
        # Rotation about the gravity axis: after the integrators' axis remap
        # (-a1, a0, a2), accel (9.81, 0, 0) lands on the estimated-gravity
        # direction of the FRAC_PI_2-about-x init attitude, and a gyro about
        # that same axis keeps it invariant — so the gravity correction term
        # is identically zero and pure gyro tracking can be asserted.
        return [TimeIMU(timestamp_ms=i * 1000.0 / rate,
                        gyro=np.array([rate_deg, 0.0, 0.0]),
                        accl=np.array([9.81, 0.0, 0.0]))
                for i in range(n)]

    @pytest.mark.parametrize("method", [5, 6])
    def test_tracks_constant_rate(self, method):
        from gyroflow_tpu.core.imu_integration import INTEGRATORS
        from gyroflow_tpu.core import quaternion as quat
        imu = self._imu()
        tq = INTEGRATORS[method](imu, 4000.0)
        assert len(tq) == len(imu)
        np.testing.assert_allclose(np.linalg.norm(tq.quats, axis=-1), 1.0)
        # relative rotation over the last 2s ≈ 20° (gravity correction may
        # bend the start; the steady state must track the gyro)
        i0 = len(tq) // 2
        rel = quat.multiply(quat.inverse(tq.quats[i0]), tq.quats[-1])
        ang = math.degrees(quat.angle_of(rel))
        assert ang == pytest.approx(20.0, abs=3.0), ang

    @pytest.mark.parametrize("method", [5, 6])
    def test_zero_accel_nudge(self, method):
        # all-zero accel gets the reference's 1e-7 nudge instead of erroring
        from gyroflow_tpu.core.file_metadata import TimeIMU
        from gyroflow_tpu.core.imu_integration import INTEGRATORS
        imu = [TimeIMU(timestamp_ms=i * 2.0, gyro=np.array([0.0, 0.0, 5.0]))
               for i in range(500)]
        tq = INTEGRATORS[method](imu, 1000.0)
        assert len(tq) == 500
        assert np.isfinite(tq.quats).all()

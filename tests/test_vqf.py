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

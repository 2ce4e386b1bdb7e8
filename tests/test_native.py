"""Native C++ hot loops: build, parity vs Python, and speed sanity."""
import os
import time

import numpy as np
import pytest

from gyroflow_tpu import native
from gyroflow_tpu.core import quaternion as quat


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    qs = np.empty((n, 4))
    q = quat.identity()
    for i in range(n):
        q = quat.multiply(q, quat.from_rotvec(rng.normal(0, 0.01, 3)))
        qs[i] = q
    return qs


def _py_slerp_scan(quats, alphas, reverse):
    os.environ["GYROFLOW_TPU_NO_NATIVE"] = "1"
    try:
        import importlib
        # call the pure-python bodies directly by bypassing the native hook
        out = np.array(quats, copy=True)
        n = out.shape[0]
        a = np.broadcast_to(np.asarray(alphas, dtype=np.float64), (n,))
        order = range(n - 2, -1, -1) if reverse else range(1, n)
        q = out[-1] if reverse else out[0]
        for i in order:
            q = quat.slerp(q, out[i], a[i])
            out[i] = q
        return out
    finally:
        del os.environ["GYROFLOW_TPU_NO_NATIVE"]


class TestParity:
    def test_slerp_scan(self):
        qs = rand_quats(500)
        alphas = np.random.default_rng(1).uniform(0.01, 0.5, 500)
        for rev in (False, True):
            got = native.slerp_scan(qs, alphas, rev)
            want = _py_slerp_scan(qs, alphas, rev)
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_ema_scan(self):
        rng = np.random.default_rng(2)
        vals = rng.standard_normal((400, 3))
        alphas = rng.uniform(0.01, 0.9, 400)
        for rev in (False, True):
            got = native.ema_scan(vals, alphas, rev)
            prev_env = os.environ.get("GYROFLOW_TPU_NO_NATIVE")
            want = np.array(vals, copy=True)
            n = want.shape[0]
            idxs = range(n - 2, -1, -1) if rev else range(1, n)
            prev = want[-1] if rev else want[0]
            for i in idxs:
                prev = prev * (1.0 - alphas[i]) + want[i] * alphas[i]
                want[i] = prev
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_per_axis_scan(self):
        qs = rand_quats(200, seed=3)
        rng = np.random.default_rng(4)
        factors = rng.uniform(0.05, 1.0, (200, 3))
        # python reference (inline, mirrors base.per_axis_scan fallback)
        out = np.array(qs, copy=True)
        q = out[0]
        for i in range(1, 200):
            d = quat.multiply(quat.inverse(q), out[i])
            roll, pitch, yaw = quat.euler_angles(d)
            rot = quat.from_euler_xyz(roll * factors[i, 0], pitch * factors[i, 1],
                                      yaw * factors[i, 2])
            q = quat.multiply(q, rot)
            out[i] = q
        got = native.per_axis_scan(qs, factors, False)
        # normalize both (python path doesn't renormalize explicitly)
        got = got / np.linalg.norm(got, axis=1, keepdims=True)
        out = out / np.linalg.norm(out, axis=1, keepdims=True)
        np.testing.assert_allclose(np.abs(np.sum(got * out, axis=1)), 1.0, atol=1e-9)

    def test_vqf_native_matches_python(self):
        from gyroflow_tpu.core.imu_integration.vqf import (VQFParams, offline_vqf)
        rng = np.random.default_rng(5)
        n = 700
        gyr = rng.normal(0, 0.3, (n, 3))
        acc = np.tile([0.1, 0.2, 9.8], (n, 1)) + rng.normal(0, 0.1, (n, 3))
        ts = 1.0 / 500.0
        params = VQFParams(tau_acc=40.0, tau_mag=40.0)
        want = offline_vqf(gyr, acc, n, ts, params)
        pv = np.asarray([params.tau_acc, params.bias_sigma_init,
                         params.bias_forgetting_time, params.bias_clip,
                         params.bias_sigma_motion, params.bias_vertical_forgetting_factor,
                         params.bias_sigma_rest, params.rest_min_t,
                         params.rest_filter_tau, params.rest_th_gyr, params.rest_th_acc,
                         1.0, 1.0])
        got = native.vqf_offline(gyr, acc, ts, pv)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_speedup(self):
        # the point of the native path: beat the python scan substantially
        qs = rand_quats(20000, seed=6)
        alphas = np.full(20000, 0.05)
        t0 = time.time()
        native.slerp_scan(qs, alphas, False)
        native_t = time.time() - t0
        t0 = time.time()
        _py_slerp_scan(qs[:2000], alphas[:2000], False)
        python_t = (time.time() - t0) * 10  # extrapolate to same n
        assert native_t < python_t / 5, (native_t, python_t)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])

"""End-to-end slice: gcsv telemetry -> integrate -> smooth -> frame transform -> remap.

This is BASELINE config 1's shape (GoPro 1080p30 + gcsv + default smoothing)
at test scale.
"""
import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gyroflow_tpu.core.gyro_source import GyroSource
from gyroflow_tpu.core.keyframes import KeyframeType
from gyroflow_tpu.core.lens_profile import CameraParams, Dimensions, LensProfile
from gyroflow_tpu.core.params import ComputeParams, StabilizationParams
from gyroflow_tpu.core.smoothing import DefaultAlgo, HorizonLock
from gyroflow_tpu.core.telemetry import parse_telemetry_file
from gyroflow_tpu.ops import remap
from gyroflow_tpu.ops.distortion_models import get_model
from gyroflow_tpu.ops.frame_transform import frame_transform_at, frame_transform_for_points

W, H = 128, 96
DUR_S = 2.0
RATE = 400


@pytest.fixture(scope="module")
def gcsv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("telemetry") / "test.gcsv"
    rng = np.random.default_rng(42)
    lines = [
        "GYROFLOW IMU LOG",
        "version,1.3",
        "id,test_cam",
        "orientation,xyz",
        "tscale,0.001",
        "gscale,0.00122173047",  # raw -> rad/s
        "ascale,0.00048828125",  # raw -> g
        "t,gx,gy,gz,ax,ay,az",
    ]
    n = int(DUR_S * RATE)
    for i in range(n):
        t = i * 1000.0 / RATE  # ms ticks at tscale 0.001
        wob = np.sin(i / 17.0) * 400 + rng.normal(0, 150)
        gx, gy, gz = wob, wob * 0.4 + rng.normal(0, 100), rng.normal(0, 80)
        ax, ay, az = rng.normal(0, 60), rng.normal(0, 60), 2048 + rng.normal(0, 40)
        lines.append(f"{t:.1f},{gx:.0f},{gy:.0f},{gz:.0f},{ax:.0f},{ay:.0f},{az:.0f}")
    p.write_text("\n".join(lines))
    return str(p)


@pytest.fixture(scope="module")
def pipeline(gcsv_path):
    fm = parse_telemetry_file(gcsv_path)
    assert len(fm.raw_imu) == int(DUR_S * RATE)

    gyro = GyroSource()
    gyro.duration_ms = DUR_S * 1000.0
    gyro.integration_method = 1  # Complementary
    gyro.load_from_telemetry(fm)
    assert len(gyro.quaternions) > 0

    params = StabilizationParams()
    params.size = (W, H)
    params.output_size = (W, H)
    params.fps = 30.0
    params.frame_count = int(DUR_S * 30)
    params.duration_ms = DUR_S * 1000.0
    params.frame_readout_time = 8.0

    lens = LensProfile(
        calib_dimension=Dimensions(W, H),
        fisheye_params=CameraParams(
            camera_matrix=[[W * 0.6, 0, W / 2], [0, W * 0.6, H / 2], [0, 0, 1]],
            distortion_coeffs=[0.25, -0.05, 0.01, -0.001]),
        distortion_model="opencv_fisheye")
    lens.init()

    class MgrStub:
        pass

    mgr = MgrStub()
    mgr.gyro = gyro
    mgr.lens = lens
    mgr.params = params
    from gyroflow_tpu.core.keyframes import KeyframeManager
    mgr.keyframes = KeyframeManager()

    cp = ComputeParams.from_manager(mgr)
    cp.calculate_camera_fovs()

    smoothed, max_angles = gyro.recompute_smoothness(DefaultAlgo(), HorizonLock(), cp)
    gyro.smoothed_quaternions = smoothed
    gyro.max_angles = max_angles
    return cp, gyro


class TestEndToEnd:
    def test_integration_produced_rotation(self, pipeline):
        cp, gyro = pipeline
        from gyroflow_tpu.core import quaternion as quat
        total = quat.angle_between(gyro.quaternions.quats[0], gyro.quaternions.quats[-1])
        assert total > 0.01  # the synthetic path wobbles

    def test_smoothed_is_correction(self, pipeline):
        cp, gyro = pipeline
        # smoothed_quaternions hold the CORRECTION sq^-1*q; applying it to a
        # frame quat should reduce jitter: correction path is smooth
        assert len(gyro.smoothed_quaternions) == len(gyro.quaternions)
        assert all(a >= 0 for a in gyro.max_angles)

    def test_frame_transform(self, pipeline):
        cp, gyro = pipeline
        ft = frame_transform_at(cp, 500.0, 15)
        assert ft.matrices.shape == (H, 14)       # per-row RS matrices
        assert np.isfinite(ft.matrices).all()
        assert ft.kernel_cfg.width == W
        assert float(ft.kernel_dyn.fov) > 0

    def test_frame_transform_no_rs(self, pipeline):
        cp, gyro = pipeline
        cp2 = ComputeParams(**{**cp.__dict__})
        cp2.frame_readout_time = 0.0
        ft = frame_transform_at(cp2, 500.0, 15)
        assert ft.matrices.shape == (1, 14)

    def test_remap_end_to_end(self, pipeline):
        cp, gyro = pipeline
        ft = frame_transform_at(cp, 500.0, 15)
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (H, W, 1)).astype(np.float32)
        out = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(ft.matrices), ft.kernel_cfg, ft.kernel_dyn))
        assert out.shape == (H, W, 1)
        assert np.isfinite(out).all()
        assert (out > 0).mean() > 0.3  # mostly image, some background

    def test_points_transform(self, pipeline):
        cp, gyro = pipeline
        pts = np.array([[10.0, 10.0], [W - 10.0, H - 10.0]])
        scaled_k, dist, new_k, rotations, shifts, mesh, fov = \
            frame_transform_for_points(cp, pts, 500.0, 15, True)
        assert rotations.shape == (2, 3, 3)
        assert shifts is None and mesh is None
        assert fov > 0

    def test_sync_offset_changes_lookup(self, pipeline):
        cp, gyro = pipeline
        q_before = gyro.org_quat_at_timestamp(500.0)
        gyro.set_offset(500_000, 25.0)
        q_after = gyro.org_quat_at_timestamp(500.0)
        gyro.clear_offsets()
        from gyroflow_tpu.core import quaternion as quat
        assert quat.angle_between(q_before, q_after) > 1e-5


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])

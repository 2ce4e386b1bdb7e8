import math

import numpy as np
import pytest

import jax.numpy as jnp

from gyroflow_tpu.ops import distortion_models as dm


# Realistic coefficient sets (shapes/magnitudes of real lens profiles)
COEFFS = {
    "opencv_fisheye": [0.25, -0.1, 0.03, -0.004],
    "opencv_standard": [-0.28, 0.09, 0.0001, -0.0002, -0.015],
    "poly3": [0.08],
    "poly5": [0.05, -0.01],
    "ptlens": [0.01, -0.03, 0.02],
    "insta360": [0.05, -0.01, 0.002, 0.0005, -0.0003, 1.1],
    "sony": [1.0, 0.02, 0.1, -0.05, 0.01, -0.001],
    "generic_polynomial": [1.0, 0.0, 0.16, 0.0, 0.012] + [0.0] * 7,
    "gopro": [0.0, 1.1, 0.05, 0.22, -0.1, 0.02, 0.0],
}

DIGITAL = ["gopro_superview", "gopro6_superview", "gopro_hyperview", "digital_stretch", "gopro_warp"]


def make_params(model_id):
    k = COEFFS.get(model_id, [])
    dl = None
    if model_id == "digital_stretch":
        dl = [1.333333, 1.0]
    if model_id == "gopro_warp":
        # plausible in-camera MAPX/MAPY polynomial + stretch factor
        dl = [1.05, 0.2, -0.1, 0.05, -0.01, 0.002, -0.0001, 0.02,
              1.02, 0.05, -0.01, 0.03, -0.005, 0.001, 1.3333, 0.0]
    return dm.LensParams.make(k=k, digital_lens_params=dl,
                              width=1920, height=1080, output_width=1920, output_height=1080)


def scalar_fisheye_undistort_rust(px, py, k):
    """Literal transcription of the reference control flow (opencv_fisheye.rs:12-72),
    with real early breaks, as an oracle for the masked-loop JAX version."""
    if k[0] == 0 and k[1] == 0 and k[2] == 0 and k[3] == 0:
        return (px, py), True
    EPS = 1e-6
    theta_d = math.sqrt(px * px + py * py)
    theta_d = min(max(theta_d, -math.pi), math.pi)
    converged = False
    theta = theta_d
    scale = 0.0
    if abs(theta_d) > EPS:
        theta = 0.0
        for _ in range(10):
            t2 = theta * theta
            t4 = t2 * t2
            t6 = t4 * t2
            t8 = t6 * t2
            k0t2, k1t4, k2t6, k3t8 = k[0] * t2, k[1] * t4, k[2] * t6, k[3] * t8
            fix = (theta * (1 + k0t2 + k1t4 + k2t6 + k3t8) - theta_d) / \
                  (1 + 3 * k0t2 + 5 * k1t4 + 7 * k2t6 + 9 * k3t8)
            fix = min(max(fix, -0.9), 0.9)
            theta -= fix
            if abs(fix) < EPS:
                converged = True
                break
        scale = math.tan(theta) / theta_d
    else:
        converged = True
    flipped = (theta_d < 0 < theta) or (theta_d > 0 > theta)
    if converged and not flipped:
        return (px * scale, py * scale), True
    return (px, py), False


class TestRoundTrips:
    @pytest.mark.parametrize("model_id", list(COEFFS.keys()))
    def test_physical_roundtrip(self, model_id):
        model = dm.MODELS[model_id]
        p = make_params(model_id)
        # moderate field angles (inside every model's convergence domain)
        xs = np.linspace(-0.4, 0.4, 9, dtype=np.float32)
        ys = np.linspace(-0.3, 0.3, 9, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)
        pts = np.stack([gx.ravel(), gy.ravel()], axis=-1)

        distorted = np.asarray(model.distort(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
                                             jnp.ones(pts.shape[0], jnp.float32), p))
        undist, valid = model.undistort(jnp.asarray(distorted), p)
        undist = np.asarray(undist)
        valid = np.asarray(valid)
        assert valid.mean() > 0.95, f"{model_id}: too many invalid points"
        err = np.abs(undist[valid] - pts[valid])
        assert err.max() < 2e-3, f"{model_id}: roundtrip err {err.max()}"

    @pytest.mark.parametrize("model_id", DIGITAL)
    def test_digital_roundtrip(self, model_id):
        model = dm.MODELS[model_id]
        p = make_params(model_id)
        xs = np.linspace(200, 1700, 7, dtype=np.float32)
        ys = np.linspace(150, 950, 7, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)
        # undistort (processed->real) then distort (real->processed) round trip
        pts = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)
        und, valid = model.undistort(jnp.asarray(pts), p)
        back = np.asarray(model.distort(jnp.asarray(und)[:, 0], jnp.asarray(und)[:, 1],
                                        jnp.ones(pts.shape[0], jnp.float32), p))
        ok = np.all(back > -9000, axis=-1)
        assert ok.mean() > 0.9
        err = np.abs(back[ok] - pts[ok])
        assert err.max() < 0.1, f"{model_id}: roundtrip err {err.max()}px"


class TestAgainstScalarOracle:
    def test_fisheye_matches_rust_control_flow(self):
        k = COEFFS["opencv_fisheye"]
        p = make_params("opencv_fisheye")
        rng = np.random.default_rng(7)
        pts = rng.uniform(-1.5, 1.5, size=(200, 2)).astype(np.float32)
        got, valid = dm.fisheye_undistort(jnp.asarray(pts), p)
        got = np.asarray(got)
        valid = np.asarray(valid)
        for i in range(len(pts)):
            (ex, ey), evalid = scalar_fisheye_undistort_rust(float(pts[i, 0]), float(pts[i, 1]), k)
            assert valid[i] == evalid, f"pt {pts[i]}: valid {valid[i]} vs {evalid}"
            if evalid:
                np.testing.assert_allclose(got[i], [ex, ey], rtol=2e-4, atol=2e-5)

    def test_fisheye_zero_k_passthrough(self):
        p = dm.LensParams.make()
        pts = jnp.asarray([[0.3, -0.2]], jnp.float32)
        out, valid = dm.fisheye_undistort(pts, p)
        assert np.allclose(out, pts) and bool(valid[0])
        out2 = dm.fisheye_distort(pts[:, 0], pts[:, 1], jnp.ones(1), p)
        assert np.allclose(out2, pts)

    def test_center_point(self):
        for mid in COEFFS:
            p = make_params(mid)
            model = dm.MODELS[mid]
            out = model.distort(jnp.zeros(1), jnp.zeros(1), jnp.ones(1), p)
            assert np.all(np.isfinite(np.asarray(out))), mid
            und, _ = model.undistort(jnp.zeros((1, 2), jnp.float32), p)
            assert np.all(np.isfinite(np.asarray(und))), mid


class TestDigitalSemantics:
    def test_stretch_exact(self):
        p = make_params("digital_stretch")
        out, _ = dm.digital_stretch_undistort(jnp.asarray([[1333.333, 500.0]], jnp.float32), p)
        np.testing.assert_allclose(np.asarray(out), [[1000.0, 500.0]], rtol=1e-5)

    def test_superview_x_compression(self):
        p = make_params("gopro_superview")
        # superview stretches edges horizontally: undistort of right edge moves outward pre-/1.333
        out, _ = dm.superview_undistort(jnp.asarray([[960.0, 540.0]], jnp.float32), p)
        np.testing.assert_allclose(np.asarray(out), [[960.0, 540.0]], atol=1e-3)  # center fixed

    def test_gopro_warp_non_convergent_sentinel(self):
        # steep in-domain slope makes the 12-step fixed-point oscillate; the
        # residual check must then return the reference's (-99999,-99999)
        dl = [5.0, 0, 0, 0, 0, 0, 0, 0, 5.0, 0, 0, 0, 0, 0, 1.0, 0]
        p = dm.LensParams.make(k=[], digital_lens_params=dl, width=1920, height=1080,
                               output_width=1920, output_height=1080)
        out = dm.gopro_warp_distort(jnp.asarray([1200.0]), jnp.asarray([700.0]),
                                    jnp.ones(1), p)
        assert np.all(np.asarray(out) < -9000)


class TestRadialLimit:
    def test_fisheye_limit(self):
        model = dm.MODELS["opencv_fisheye"]
        # strong negative k produces a fold before pi/2
        lim = dm.radial_distortion_limit(model, [-0.2, -0.05, 0.0, 0.0])
        assert lim is not None and 0.5 < lim < 10.0

    def test_no_limit_for_mild(self):
        model = dm.MODELS["opencv_fisheye"]
        lim = dm.radial_distortion_limit(model, [0.01, 0.0, 0.0, 0.0])
        assert lim is None


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

"""Sony mesh correction + FPD + splines tests."""
import numpy as np
import pytest

import jax.numpy as jnp

import oracle
from gyroflow_tpu.core.splines import (CatmullRom, build_mesh_buffer,
                                       bivariate_interpolate, interpolate_mesh)
from gyroflow_tpu.ops import remap
from gyroflow_tpu.ops.kernel_params import HAS_FPD_DATA, HAS_MESH_DATA
from test_remap_golden import W, H, make_image, make_pair


def make_mesh(fpd=False, seed=0):
    """Synthetic 9x9 gentle warp mesh over the test frame."""
    rng = np.random.default_rng(seed)
    gw = gh = 9
    gx, gy = np.meshgrid(np.linspace(0, W, gw), np.linspace(0, H, gh))
    pts = np.stack([gx + rng.normal(0, 0.6, gx.shape),
                    gy + rng.normal(0, 0.6, gy.shape)], axis=-1)
    shears = rng.normal(0, 0.01, (8, 2)) if fpd else None
    return build_mesh_buffer(pts, (float(W), float(H)),
                             origin=(0.0, 0.0), crop_size=(float(W), float(H)),
                             focal_plane_shears=shears, fpd_enabled=fpd)


class TestSplines:
    def test_catmull_rom_hits_points(self):
        cr = CatmullRom([0.0, 1.0, 2.0, 3.0], [[0.0], [1.0], [4.0], [9.0]])
        for t, v in [(1.0, 1.0), (2.0, 4.0)]:
            assert abs(cr.interpolate(t)[0, 0] - v) < 1e-9

    def test_catmull_rom_outside_zero(self):
        cr = CatmullRom([0.0, 1.0], [[1.0], [2.0]])
        assert cr.interpolate(5.0)[0, 0] == 0.0  # out of range -> default

    def test_bivariate_identity_grid(self):
        # identity mesh: grid points = coordinates -> interpolation returns input
        mesh = make_mesh(seed=999)
        gw = gh = 9
        gx, gy = np.meshgrid(np.linspace(0, W, gw), np.linspace(0, H, gh))
        pts = np.stack([gx, gy], axis=-1)
        mesh_id = build_mesh_buffer(pts, (float(W), float(H)))
        xs = np.array([10.0, 30.0, 55.0])
        ys = np.array([5.0, 20.0, 44.0])
        out = interpolate_mesh(xs, ys, (float(W), float(H)), mesh_id)
        np.testing.assert_allclose(out[:, 0], xs, atol=1e-6)
        np.testing.assert_allclose(out[:, 1], ys, atol=1e-6)


class TestMeshGolden:
    def _run(self, fpd):
        img = make_image()
        cfg, dyn, p, matrices = make_pair()
        mesh = make_mesh(fpd=fpd)
        flags = cfg.flags | HAS_MESH_DATA | (HAS_FPD_DATA if fpd else 0)
        cfg = cfg._replace(flags=flags, mesh_grid=(9, 9))
        got = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn,
            jnp.asarray(mesh, jnp.float32)))
        want = oracle.undistort_image(img, p, matrices, mesh)
        diff = np.abs(got - want)
        assert diff.max() < 1.0, f"mesh golden diff {diff.max()}"

    def test_mesh_golden(self):
        self._run(fpd=False)

    def test_mesh_plus_fpd_golden(self):
        self._run(fpd=True)

    def test_mesh_changes_output(self):
        img = make_image()
        cfg, dyn, p, matrices = make_pair()
        base = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn))
        rng = np.random.default_rng(3)
        gw = gh = 9
        gx, gy = np.meshgrid(np.linspace(0, W, gw), np.linspace(0, H, gh))
        pts = np.stack([gx + 2.0, gy], axis=-1)  # constant 2px x-shift
        mesh = build_mesh_buffer(pts, (float(W), float(H)))
        cfg2 = cfg._replace(flags=cfg.flags | HAS_MESH_DATA, mesh_grid=(9, 9))
        shifted = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(matrices), cfg2, dyn,
            jnp.asarray(mesh, jnp.float32)))
        assert np.abs(shifted - base).max() > 1.0  # warp visibly applied


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestMeshPallas:
    """Mesh/FPD through the Pallas sampling path (coords in XLA)."""

    @pytest.mark.parametrize("fpd", [False, True])
    def test_matches_xla_path(self, fpd):
        img = make_image()
        cfg, dyn, p, matrices = make_pair()
        mesh = jnp.asarray(make_mesh(fpd=fpd), jnp.float32)
        flags = cfg.flags | HAS_MESH_DATA | (HAS_FPD_DATA if fpd else 0)
        cfg = cfg._replace(flags=flags, mesh_grid=(9, 9))
        xla = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn, mesh))
        pal, ov = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn, mesh,
            win_h=64, win_w=512)
        assert not bool(ov)
        diff = np.abs(np.asarray(pal) - xla)
        # Pallas quantizes interpolation phases to 1/32 px — sub-pixel budget
        assert diff.max() < 3.0 and np.percentile(diff, 99) < 1.0, \
            (diff.max(), np.percentile(diff, 99))

    def test_oracle_golden_through_pallas(self):
        img = make_image()
        cfg, dyn, p, matrices = make_pair()
        mesh = make_mesh(fpd=False)
        cfg = cfg._replace(flags=cfg.flags | HAS_MESH_DATA, mesh_grid=(9, 9))
        pal, ov = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn,
            jnp.asarray(mesh, jnp.float32), win_h=64, win_w=512)
        assert not bool(ov)
        want = oracle.undistort_image(img, p, matrices, mesh)
        diff = np.abs(np.asarray(pal) - want)
        assert np.percentile(diff, 99) < 2.0, np.percentile(diff, 99)

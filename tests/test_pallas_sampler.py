"""Pallas sampling kernel (interpret mode on CPU) vs the XLA gather path.

The XLA path is already golden-tested against the scalar oracle; equality here
transitively proves the Pallas kernel's parity.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gyroflow_tpu.ops import remap
from test_remap_golden import make_image, make_pair, W, H


def compare_pallas(cfg, dyn, p, matrices, img, tol=0.05):
    want = np.asarray(remap.remap_plane_jit(jnp.asarray(img), jnp.asarray(matrices), cfg, dyn))
    got, overflow = remap.remap_plane_pallas_jit(
        jnp.asarray(img), jnp.asarray(matrices), cfg, dyn, win_h=48, win_w=64)
    assert not bool(overflow), "window overflow on tiny frame"
    got = np.asarray(got)
    diff = np.abs(got - want)
    assert diff.max() < tol, f"pallas vs xla pixel diff {diff.max()}"
    return got


class TestPallasSampler:
    def test_bilinear(self):
        compare_pallas(*make_pair(), img=make_image())

    def test_bicubic(self):
        compare_pallas(*make_pair(interpolation=4), img=make_image())

    def test_lanczos4(self):
        # lanczos LUT rows sum to 1 only within f32 rounding; bg-weight algebra
        # admits slightly larger differences at edges
        compare_pallas(*make_pair(interpolation=8), img=make_image(), tol=0.2)

    def test_rolling_shutter(self):
        rotations = [(0.02 + 0.0006 * i, -0.03 + 0.0004 * i, 0.01) for i in range(H)]
        compare_pallas(*make_pair(rotations=rotations), img=make_image())

    def test_bg_repeat(self):
        # at the repeat-clamp boundary a 1-ulp coordinate difference (tiled
        # iota grid vs meshgrid op ordering) can flip one 1/32 interpolation
        # phase on a single pixel — allow that quantum
        compare_pallas(*make_pair(background_mode=1, fov=1.4), img=make_image(),
                       tol=0.15)

    def test_bg_margin_feather(self):
        compare_pallas(*make_pair(background_mode=3, fov=1.2), img=make_image())

    def test_rgba(self):
        compare_pallas(*make_pair(), img=make_image(c=4))

    def test_zoomed_out_background_taps(self):
        # fov > 1 puts many taps outside the source rect -> bg weighting path
        compare_pallas(*make_pair(fov=1.6), img=make_image())


class TestRolledWindow:
    """win_k < win_w: the kernel DMAs a 128-aligned 256-wide window but rolls
    the tile's source band to lane 0 and contracts only 128 lanes (one MXU
    K-pass). Needs a frame wide enough that win_w=256 < padded width."""

    def _run(self, interpolation, c=1, tol=0.05):
        from gyroflow_tpu.ops import pallas_sampler as ps
        from gyroflow_tpu.ops.kernel_params import KernelConfig, KernelDynamics

        Wb, Hb = 640, 64
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (Hb, Wb, c)).astype(np.float32)
        cfg = KernelConfig(width=Wb, height=Hb, output_width=Wb, output_height=Hb,
                           interpolation=interpolation,
                           distortion_model="opencv_fisheye")
        dyn = KernelDynamics.make(f=(300.0, 300.0), c=(Wb / 2, Hb / 2),
                                  k=[0.0] * 4, fov=1.0, max_pixel_value=255.0,
                                  pixel_value_limit=1e30, background=(0, 0, 0, 1))
        # synthetic uv: zoom + shift, spans ~104 source cols per 96-px tile
        spec = ps.SamplerSpec.create(
            height=Hb, width=Wb, out_height=Hb, out_width=Wb,
            interpolation=interpolation, tile_h=16, tile_w=96,
            win_h=48, win_w=256, win_k=128)
        assert spec.win_k == 128 and spec.win_w == 256
        ox, oy, pad_ok = ps.tiled_grid(spec)
        u_t = ox * 1.07 - 12.3
        v_t = oy * 0.95 + 3.7
        valid_t = pad_ok
        imgs = jnp.moveaxis(jnp.asarray(img), -1, 0)
        out_t, overflow = ps.sample_planes_t(spec, imgs, u_t, v_t, valid_t,
                                             jnp.zeros(c))
        assert not bool(overflow)
        want = remap.sample_input(jnp.asarray(img),
                                  jnp.stack([u_t, v_t], axis=-1),
                                  jnp.zeros(c), cfg, dyn)
        got = np.asarray(jnp.moveaxis(out_t, 0, -1))   # (C, nt, P) -> (nt, P, C)
        diff = np.abs(got - np.asarray(want))[np.asarray(valid_t)]
        assert diff.max() < tol, f"rolled vs xla diff {diff.max()}"

    def test_rolled_bilinear(self):
        self._run(2)

    def test_rolled_lanczos4(self):
        self._run(8, tol=0.2)

    def test_rolled_multichannel(self):
        self._run(4, c=2)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])

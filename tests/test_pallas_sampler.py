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


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])

"""Overlay canvas + in-remap blend (gpu/drawing.rs + spirv drawing.rs)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gyroflow_tpu.core.drawing import (ALPHAS, COLORS, COLOR_GREEN, COLOR_RED,
                                       DrawCanvas, STAGE_ON_INPUT, STAGE_ON_OUTPUT)
from gyroflow_tpu.ops import remap
from gyroflow_tpu.ops.kernel_params import DRAWING_ENABLED, KernelConfig, KernelDynamics

W, H = 128, 96


def make_cfg_dyn(flags=DRAWING_ENABLED):
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=2, distortion_model="opencv_fisheye",
                       flags=flags)
    dyn = KernelDynamics.make(f=(W * 0.8, W * 0.8), c=(W / 2, H / 2),
                              k=[0.0, 0.0, 0.0, 0.0], fov=1.0,
                              max_pixel_value=255.0, pixel_value_limit=255.0)
    return cfg, dyn


def identityish_matrices():
    new_k = np.array([[W * 0.8, 0, W / 2], [0, W * 0.8, H / 2], [0, 0, 1.0]])
    m = np.linalg.inv(new_k)
    return jnp.asarray([list(m.flatten()) + [0.0] * 5], jnp.float32)


class TestCanvas:
    def test_packing(self):
        c = DrawCanvas(W, H, W, H, 1)
        c.put_pixel(10, 20, COLOR_RED, 1, STAGE_ON_OUTPUT)
        assert c.buffer[20, 10] == (1 << 3) | (1 << 1) | 1
        assert c.has_any_pixels

    def test_scale_and_bounds(self):
        c = DrawCanvas(W, H, W, H, 2)
        assert c.get_size() == (W // 2, H // 2)
        c.put_pixel(11, 21, COLOR_GREEN, 0, STAGE_ON_INPUT)
        assert c.buffer[10, 5] == (2 << 3)
        c.put_pixel(-5, 0, COLOR_GREEN, 0, STAGE_ON_INPUT)  # out of range: no-op

    def test_block_size(self):
        c = DrawCanvas(W, H, W, H, 1)
        c.put_pixel(30, 30, COLOR_RED, 0, STAGE_ON_OUTPUT, size=4)
        assert (c.buffer > 0).sum() == 16


class TestBlend:
    def _run(self, canvas, flags=DRAWING_ENABLED):
        cfg, dyn = make_cfg_dyn(flags)
        img = jnp.full((H, W, 3), 100.0, jnp.float32)
        out = remap.remap_plane(img, identityish_matrices(), cfg, dyn,
                                drawing=canvas.state())
        return np.asarray(out)

    def test_output_stage_colored(self):
        c = DrawCanvas(W, H, W, H, 1)
        c.put_pixel(40, 30, COLOR_RED, 0, STAGE_ON_OUTPUT)  # alpha 100%
        out = self._run(c)
        np.testing.assert_allclose(out[30, 40], [255.0, 0.0, 0.0], atol=1e-3)
        # neighbors untouched
        np.testing.assert_allclose(out[31, 40], 100.0, atol=1e-3)

    def test_alpha_blend_50(self):
        c = DrawCanvas(W, H, W, H, 1)
        c.put_pixel(40, 30, COLOR_RED, 2, STAGE_ON_OUTPUT)  # Alpha50
        out = self._run(c)
        np.testing.assert_allclose(out[30, 40], [255 * 0.5 + 100 * 0.5,
                                                 100 * 0.5, 100 * 0.5], atol=1e-3)

    def test_stage_gating(self):
        # an input-stage byte must NOT paint at that output location directly;
        # it paints wherever source uv hits it (identity-ish here, so nearly
        # the same spot — use flag off as the control instead)
        c = DrawCanvas(W, H, W, H, 1)
        c.put_pixel(40, 30, COLOR_RED, 0, STAGE_ON_OUTPUT)
        out = self._run(c, flags=0)  # DRAWING_ENABLED off → untouched
        np.testing.assert_allclose(out[30, 40], 100.0, atol=1e-3)

    def test_input_stage_draws_at_source_position(self):
        c = DrawCanvas(W, H, W, H, 1)
        c.put_pixel(64, 48, COLOR_GREEN, 0, STAGE_ON_INPUT, size=3)
        out = self._run(c)
        # identity-ish mapping: the source-space mark shows up near (64,48)
        region = out[44:53, 60:69]
        assert (np.abs(region[..., 1] - 255.0) < 1.0).any()

    def test_safe_area_dimming(self):
        cfg, dyn = make_cfg_dyn()
        img = jnp.full((H, W, 3), 200.0, jnp.float32)
        c = DrawCanvas(W, H, W, H, 1)
        out = np.asarray(remap.remap_plane(
            img, identityish_matrices(), cfg, dyn,
            drawing=c.state(safe_area_rect=(20.0, 20.0, 100.0, 70.0))))
        np.testing.assert_allclose(out[40, 60], 200.0, atol=1e-3)     # inside
        np.testing.assert_allclose(out[40, 110], 100.0, atol=1e-3)    # outside
        np.testing.assert_allclose(out[40, 102], 50.0, atol=1e-3)     # border band

    def test_pallas_path_falls_back(self):
        cfg, dyn = make_cfg_dyn()
        img = jnp.full((H, W, 1), 100.0, jnp.float32)
        c = DrawCanvas(W, H, W, H, 1)
        c.put_pixel(40, 30, COLOR_RED, 0, STAGE_ON_OUTPUT)
        out, ov = remap.remap_plane_pallas(img, identityish_matrices(), cfg, dyn,
                                           drawing=c.state())
        assert not bool(ov)
        np.testing.assert_allclose(np.asarray(out)[30, 40], [255.0], atol=1e-3)

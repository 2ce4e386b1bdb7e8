import numpy as np
import pytest

from gyroflow_tpu.ops.pixel_formats import (FORMATS, Plane, merge_yuv420,
                                            plane_background, rgb_to_yuv,
                                            split_yuv420, yuv_to_rgb)


class TestYUV:
    def test_primaries(self):
        # white -> Y=1, U=V=0.5
        out = rgb_to_yuv(np.array([1.0, 1.0, 1.0, 1.0]))
        np.testing.assert_allclose(out, [1.0, 0.5, 0.5, 1.0], atol=1e-6)
        # black
        out = rgb_to_yuv(np.array([0.0, 0.0, 0.0, 1.0]))
        np.testing.assert_allclose(out, [0.0, 0.5, 0.5, 1.0], atol=1e-6)

    def test_limited_range(self):
        out = rgb_to_yuv(np.array([1.0, 1.0, 1.0, 1.0]), is_limited=True)
        np.testing.assert_allclose(out[0], 235.0 / 255.0, atol=1e-6)
        np.testing.assert_allclose(out[1], 16.0 / 255.0 + 0.5 * 224.0 / 255.0, atol=1e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        rgba = rng.uniform(0.1, 0.9, (32, 4)).astype(np.float32)
        for lim in (False, True):
            back = yuv_to_rgb(rgb_to_yuv(rgba, lim), lim)
            np.testing.assert_allclose(back, rgba, atol=1e-5)


class TestPlanes:
    def test_split_merge(self):
        rng = np.random.default_rng(1)
        y = rng.integers(0, 1024, (48, 64)).astype(np.uint16)
        u = rng.integers(0, 1024, (24, 32)).astype(np.uint16)
        v = rng.integers(0, 1024, (24, 32)).astype(np.uint16)
        planes = split_yuv420(y, u, v, bit_depth=10)
        assert planes[0].fmt.name == "Luma16"
        assert planes[1].fmt.name == "UV16"
        assert planes[1].data.shape == (24, 32, 2)
        y2, u2, v2 = merge_yuv420(planes, bit_depth=10)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_array_equal(u2, u)
        np.testing.assert_array_equal(v2, v)

    def test_plane_background(self):
        bg = [0.5, 0.25, 0.1, 1.0]
        y_bg = plane_background(bg, FORMATS["Luma8"], 0, False)
        uv_bg = plane_background(bg, FORMATS["UV8"], 1, False)
        assert y_bg.shape == (1,)
        assert uv_bg.shape == (2,)
        rgb_bg = plane_background(bg, FORMATS["RGBA8"], 0, False)
        np.testing.assert_allclose(rgb_bg, bg)

    def test_registry_counts(self):
        assert len(FORMATS) == 13  # matches pixel_formats.rs type list


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

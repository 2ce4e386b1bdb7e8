"""Probe 25 (round 4): self-contained coords kernel vs XLA-pre coords path.

The classic RS coords path materializes x/y/idx via a full-frame XLA
coords_pre fusion (the probe is a full projection per pixel), reduces idx
per tile for the matrix windows, and the kernel reads the three arrays
back (~0.6 ms/frame of the 8.4 ms 4K step per the r4 HLO/trace analysis).
project_tiles_gen moves all of it into the kernel (arithmetic ox/oy,
in-kernel probe, coarse 6-point matrix-window plan, exact in-kernel window
check). This probe times the full bench step both ways on the real chip
and reports the output delta (XLA-vs-Mosaic probe math may differ by f32
contraction order -> occasional one-phase tap flips, NOT geometry error).

Run: python experiments/perf_probe25.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_matrices  # noqa: E402

FRAMES = 12


def main():
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import pallas_coords as pc
    from gyroflow_tpu.ops import pallas_sampler as ps
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import (FIX_COLOR_RANGE, KernelConfig,
                                                KernelDynamics)

    rng = np.random.default_rng(0)
    planes = []
    for (W, H, plane_index, kchan) in ((3840, 2160, 0, 1), (1920, 1080, 1, 2)):
        f = (W * 0.62, W * 0.62)
        fov = 0.92
        cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                           interpolation=8, distortion_model="opencv_fisheye",
                           plane_index=plane_index, flags=FIX_COLOR_RANGE)
        dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2),
                                  k=[0.25, -0.07, 0.02, -0.003], fov=fov,
                                  max_pixel_value=1023.0,
                                  pixel_value_limit=1023.0,
                                  background=(0, 0, 0, 1))
        img = jnp.asarray(rng.uniform(0, 1023, (H, W, kchan)).astype(np.float32))
        mats = jnp.asarray(make_matrices(W, H, f, fov, H))
        planes.append((cfg, dyn, img, mats))

    WIN = (40, 256, 128, 96, 32)
    TILE_H = 16

    def mk_spec(cfg, img):
        return ps.SamplerSpec.create(
            height=img.shape[0], width=img.shape[1],
            out_height=cfg.output_height, out_width=cfg.output_width,
            interpolation=8, tile_h=TILE_H, tile_w=WIN[3], win_h=WIN[0],
            win_w=WIN[1], source_rect=cfg.src_rect, win_k=WIN[2], win_r=WIN[4])

    specs = [mk_spec(planes[0][0], planes[0][2]),
             mk_spec(planes[1][0], planes[1][2])]

    def plane_old(cfg, dyn, spec, img, mats, salt):
        """The classic XLA-pre coords chain + sampler (pre-r4 path)."""
        ox, oy, pad_ok = ps.tiled_grid(spec)
        out_pos = jnp.stack([ox, oy], axis=-1)
        factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
        out_c = (float(cfg.output_width) / 2.0, float(cfg.output_height) / 2.0)
        out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)
        x, y, idx, _p = remap.coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
        u, v, valid_t, ov = pc.project_tiles(cfg, dyn, mats, x, y, idx,
                                             win_m=64)
        u, v = remap.coords_post_uv(u, v, cfg)
        valid = (valid_t > 0.5) & pad_ok
        imgs = jnp.moveaxis(img + salt, -1, 0)
        bg = (dyn.background * dyn.max_pixel_value)[:imgs.shape[0]]
        pixel, sov = ps.sample_planes_t(spec, imgs, u, v, valid, bg)
        pixel = jnp.minimum(pixel, dyn.pixel_value_limit)
        pixel = jnp.where(valid[None], pixel, bg.reshape(-1, 1, 1))
        pixel = remap._remap_colorrange_t(pixel, cfg.plane_index == 0,
                                         dyn.max_pixel_value)
        return jnp.moveaxis(ps.out_untileize_c(spec, pixel), 0, -1), ov | sov

    @jax.jit
    def step_old(y, yl, uv, uvm, salt):
        oy_, ov0 = plane_old(planes[0][0], planes[0][1], specs[0], y,
                             yl, salt)
        ouv, ov1 = plane_old(planes[1][0], planes[1][1], specs[1], uv,
                             uvm, salt)
        return oy_, ouv, ov0 | ov1

    @jax.jit
    def step_new(y, yl, uv, uvm, salt):
        cfg0, dyn0 = planes[0][0], planes[0][1]
        cfg1, dyn1 = planes[1][0], planes[1][1]
        out_y, ov0 = remap.remap_plane_pallas(
            y + salt, yl, cfg0, dyn0, win_h=WIN[0], win_w=WIN[1],
            win_k=WIN[2], tile_w=WIN[3], tile_h=TILE_H, win_r=WIN[4])
        out_uv, ov1 = remap.remap_plane_pallas(
            uv + salt, uvm, cfg1, dyn1, win_h=WIN[0], win_w=WIN[1],
            win_k=WIN[2], tile_w=WIN[3], tile_h=TILE_H, win_r=WIN[4])
        return out_y, out_uv, ov0 | ov1

    y_img, y_mats = planes[0][2], planes[0][3]
    uv_img, uv_mats = planes[1][2], planes[1][3]
    z = jnp.float32(0.0)

    oA = step_old(y_img, y_mats, uv_img, uv_mats, z)
    oB = step_new(y_img, y_mats, uv_img, uv_mats, z)
    assert not bool(oA[2]) and not bool(oB[2]), (bool(oA[2]), bool(oB[2]))
    for name, a, b in (("Y", oA[0], oB[0]), ("UV", oA[1], oB[1])):
        d = np.abs(np.asarray(a) - np.asarray(b))
        print(f"{name} delta: max={d.max():.4f} mean={d.mean():.6f} "
              f">1code={(d > 1.0).mean() * 100:.5f}%")

    salts = [jnp.float32(i * 1e-6) for i in range(FRAMES)]

    def timeit(stepf, tag):
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [stepf(y_img, y_mats, uv_img, uv_mats, salts[i])
                    for i in range(FRAMES)]
            jax.block_until_ready(outs[-1][0])
            dt = (time.time() - t0) / FRAMES
            best = dt if best is None else min(best, dt)
        print(f"{tag}: {best * 1000:.2f} ms/frame ({1 / best:.1f} fps)")
        return best

    a = timeit(step_old, "old XLA-pre coords ")
    b = timeit(step_new, "new self-contained ")
    print(f"delta: {(a - b) * 1000:+.2f} ms/frame")


if __name__ == "__main__":
    main()

"""Probe 24 (round 4): derive UV coords from Y coords (YUV420 exact halving).

Probe 19 post-band_mode trace: the UV coords kernel costs 0.48 ms/frame and
its coords_pre / matrix-window-plan fusions another ~0.12 (fusion.125/176).
For YUV420, when the chroma plane's params are exact halves of luma's
(f_uv = f_y/2, c_uv = c_y/2, src offsets even), the projection chain is
scale-covariant at the f32 bit level EXCEPT the matrix values themselves
(numpy pinv is not exactly scale-covariant), so

    u_uv(x, y) ~= u_y(2x, 2y) / 2     (sub-1e-3 px; same geometry)

i.e. the whole UV coords stage (coords_pre probe + projection kernel +
matrix plan) can be replaced by a strided subsample of the Y coords map.
This probe measures the full bench step both ways on the real chip and
reports the UV output delta (expected: a few codes at tap-phase rounding
boundaries from the pinv-level matrix difference, NOT geometry error).

Run: python experiments/perf_probe24.py
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

    def kw(w):
        return dict(win_h=w[0], win_w=w[1], win_k=w[2], tile_w=w[3],
                    tile_h=TILE_H, win_r=w[4])

    # ---- A: baseline (per-plane coords kernels) ----
    @jax.jit
    def step_base(y, yl, uv, uvm, salt):
        cfg0, dyn0 = planes[0][0], planes[0][1]
        cfg1, dyn1 = planes[1][0], planes[1][1]
        out_y, ov0 = remap.remap_plane_pallas(y + salt, yl, cfg0, dyn0, **kw(WIN))
        out_uv, ov1 = remap.remap_plane_pallas(uv + salt, uvm, cfg1, dyn1, **kw(WIN))
        return out_y, out_uv, ov0 | ov1

    # ---- B: derived UV coords (inline fast path for both planes) ----
    def plane_coords(cfg, dyn, mats, spec):
        P = spec.tile_h * spec.tile_w
        ox, oy, pad_ok = ps.tiled_grid(spec)
        out_pos = jnp.stack([ox, oy], axis=-1)
        factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
        out_c = (float(cfg.output_width) / 2.0, float(cfg.output_height) / 2.0)
        out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)
        x, y, idx, _probe = remap.coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
        u, v, valid_t, c_ov = pc.project_tiles(cfg, dyn, mats, x, y, idx, win_m=64)
        u, v = remap.coords_post_uv(u, v, cfg)
        valid = (valid_t > 0.5) & pad_ok
        return u, v, valid, c_ov, ox, oy

    def plane_finish(cfg, dyn, spec, imgs, u, v, valid, ox, oy, bg):
        pixel, ov = ps.sample_planes_t(spec, imgs, u, v, valid, bg)
        pixel = jnp.minimum(pixel, dyn.pixel_value_limit)
        C = imgs.shape[0]
        bg_c = bg.reshape(C, 1, 1)
        pixel = jnp.where(valid[None], pixel, bg_c)
        # out_rect in_bounds chain (kept for A/B fairness with remap_plane_pallas)
        orx, ory, orw, orh = cfg.out_rect
        lx = remap.map_coord(ox, float(orx), float(orx + orw), 0.0,
                             float(cfg.output_width))
        ly = remap.map_coord(oy, float(ory), float(ory + orh), 0.0,
                             float(cfg.output_height))
        in_b = (lx >= 0.0) & (ly >= 0.0) & (lx < cfg.output_width) & (ly < cfg.output_height)
        pixel = jnp.where(in_b[None], pixel, bg_c)
        if cfg.has(FIX_COLOR_RANGE):
            pixel = remap._remap_colorrange_t(pixel, cfg.plane_index == 0,
                                              dyn.max_pixel_value)
        return jnp.moveaxis(ps.out_untileize_c(spec, pixel), 0, -1), ov

    def mk_spec(cfg, img):
        return ps.SamplerSpec.create(
            height=img.shape[0], width=img.shape[1], out_height=cfg.output_height,
            out_width=cfg.output_width, interpolation=8, tile_h=TILE_H,
            tile_w=WIN[3], win_h=WIN[0], win_w=WIN[1],
            source_rect=cfg.src_rect, win_k=WIN[2], win_r=WIN[4])

    spec_y = mk_spec(planes[0][0], planes[0][2])
    spec_uv = mk_spec(planes[1][0], planes[1][2])

    @jax.jit
    def step_derived(y, yl, uv, uvm, salt):
        cfg0, dyn0 = planes[0][0], planes[0][1]
        cfg1, dyn1 = planes[1][0], planes[1][1]
        bg0 = (dyn0.background * dyn0.max_pixel_value)[:1]
        bg1 = (dyn1.background * dyn1.max_pixel_value)[:2]
        u, v, valid, c_ov, ox, oy = plane_coords(cfg0, dyn0, yl, spec_y)
        out_y, ov0 = plane_finish(cfg0, dyn0, spec_y, jnp.moveaxis(y + salt, -1, 0),
                                  u, v, valid, ox, oy, bg0)
        # UV coords = strided subsample of the Y coords map
        uf = ps._untileize(spec_y, u)[::2, ::2] * 0.5          # (1080, 1920)
        vf = ps._untileize(spec_y, v)[::2, ::2] * 0.5
        valf = ps._untileize(spec_y, valid.astype(jnp.float32))[::2, ::2]
        uf = ps._pad_to(uf, TILE_H, WIN[3])
        vf = ps._pad_to(vf, TILE_H, WIN[3])
        valf = ps._pad_to(valf, TILE_H, WIN[3])
        u2 = ps._tileize(spec_uv, uf)
        v2 = ps._tileize(spec_uv, vf)
        _, _, pad_ok_uv = ps.tiled_grid(spec_uv)
        val2 = (ps._tileize(spec_uv, valf) > 0.5) & pad_ok_uv
        ox2, oy2, _ = ps.tiled_grid(spec_uv)[0], ps.tiled_grid(spec_uv)[1], None
        out_uv, ov1 = plane_finish(cfg1, dyn1, spec_uv,
                                   jnp.moveaxis(uv + salt, -1, 0),
                                   u2, v2, val2, ox2, oy2, bg1)
        return out_y, out_uv, ov0 | ov1 | c_ov

    y_img, y_mats = planes[0][2], planes[0][3]
    uv_img, uv_mats = planes[1][2], planes[1][3]
    z = jnp.float32(0.0)

    oyA, ouvA, ovA = step_base(y_img, y_mats, uv_img, uv_mats, z)
    oyB, ouvB, ovB = step_derived(y_img, y_mats, uv_img, uv_mats, z)
    assert not bool(ovA) and not bool(ovB), (bool(ovA), bool(ovB))
    dy = np.abs(np.asarray(oyA) - np.asarray(oyB))
    duv = np.abs(np.asarray(ouvA) - np.asarray(ouvB))
    print(f"Y   delta: max={dy.max():.4f}  (expect 0 — same path)")
    print(f"UV  delta: max={duv.max():.4f}  mean={duv.mean():.6f}  "
          f">1 code: {(duv > 1.0).mean() * 100:.4f}%")

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

    # NOTE: these steps RETURN full frames (unlike bench.py's scalar sum), so
    # absolute fps here reads lower than bench — compare A vs B only.
    a = timeit(step_base, "A baseline      ")
    b = timeit(step_derived, "B derived-UV    ")
    print(f"delta: {(a - b) * 1000:+.2f} ms/frame")


if __name__ == "__main__":
    main()

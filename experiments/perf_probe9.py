"""Probe 9: stage breakdown of the 4K Y-plane Pallas path at 62 fps.

Stages (all jitted separately, timed with the shared salt-perturbation
harness so the axon tunnel can't cache results):
  full      remap_plane_pallas (Y 3840x2160, rolled win 24x256 k128 tile 16x96)
  coords    coords_pre + project_tiles + coords_post_uv (everything before
            window planning)
  plan      plan_windows_t (per-tile bbox reduction + origin alignment)
  sampler   _sample_call with precomputed u/v/origins
  uv-full   remap_plane_pallas (UV 1920x1080x2)

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe9.py
"""
import json

import numpy as np

from perf_probe import make_matrices, timed


def main():
    import jax
    import jax.numpy as jnp
    from gyroflow_tpu.ops import pallas_sampler as ps
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    rng = np.random.default_rng(0)
    results = {}

    W, H = 3840, 2160
    f = (W * 0.62, W * 0.62)
    fov = 0.92
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=8, distortion_model="opencv_fisheye",
                       plane_index=0, flags=FIX_COLOR_RANGE)
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2), k=[0.25, -0.07, 0.02, -0.003],
                              fov=fov, max_pixel_value=1023.0,
                              pixel_value_limit=1023.0, background=(0, 0, 0, 1))
    img = jnp.asarray(rng.uniform(0, 1023, (H, W, 1)).astype(np.float32))
    mats = jnp.asarray(make_matrices(W, H, f, fov, H))

    TILE_H, TILE_W = 16, 96
    WIN = (24, 256, 128)     # win_h, win_w, win_k — the bench's rolled config

    @jax.jit
    def full(img, mats, salt):
        out, _ = remap.remap_plane_pallas(img + salt, mats, cfg, dyn,
                                          win_h=WIN[0], win_w=WIN[1],
                                          win_k=WIN[2], tile_h=TILE_H,
                                          tile_w=TILE_W)
        return jnp.sum(out)

    results["full Y"] = round(timed(full, img, mats), 3)
    print("full Y", results["full Y"], flush=True)

    spec = ps.SamplerSpec.create(height=H, width=W, out_height=H, out_width=W,
                                 interpolation=8, tile_h=TILE_H, tile_w=TILE_W,
                                 win_h=WIN[0], win_w=WIN[1], win_k=WIN[2])

    from gyroflow_tpu.ops import pallas_coords as pc
    from gyroflow_tpu.ops.remap import coords_post_uv, coords_pre

    out_c = (float(cfg.output_width) / 2.0, float(cfg.output_height) / 2.0)
    factor = max(1.0 - float(dyn.lens_correction_amount), 0.001)

    @jax.jit
    def coords(mats, salt):
        ox, oy, pad_ok = ps.tiled_grid(spec)
        out_pos = jnp.stack([ox, oy], axis=-1)
        out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)
        x, y, idx, _probe = coords_pre(out_pos, mats + salt * 1e-9, cfg, dyn,
                                       out_c, out_f)
        u, v, valid_t, ovf = pc.project_tiles(cfg, dyn, mats, x, y, idx,
                                              win_m=64)
        u, v = coords_post_uv(u, v, cfg)
        return jnp.sum(u) + jnp.sum(v) + jnp.sum(valid_t)

    results["coords"] = round(timed(coords, mats), 3)
    print("coords", results["coords"], flush=True)

    # materialize u/v once for the downstream stage timings
    @jax.jit
    def coords_out(mats):
        ox, oy, pad_ok = ps.tiled_grid(spec)
        out_pos = jnp.stack([ox, oy], axis=-1)
        out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)
        x, y, idx, _probe = coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
        u, v, valid_t, _ovf = pc.project_tiles(cfg, dyn, mats, x, y, idx,
                                               win_m=64)
        u, v = coords_post_uv(u, v, cfg)
        return u, v, valid_t > 0.5, pad_ok

    u_t, v_t, valid_t, pad_ok = coords_out(mats)
    valid_t = valid_t & pad_ok

    @jax.jit
    def plan(u_t, v_t, salt):
        y0s, x0s, xoffs, _yoffs, ovf = ps.plan_windows_t(spec, u_t + salt * 0, v_t,
                                                 valid_t)
        return jnp.sum(y0s) + jnp.sum(x0s) + jnp.sum(xoffs)

    results["plan"] = round(timed(plan, u_t, v_t), 3)
    print("plan", results["plan"], flush=True)

    imgs = jnp.moveaxis(img, -1, 0)
    bg = jnp.zeros((1,), jnp.float32)

    @jax.jit
    def sampler(imgs, u_t, v_t, salt):
        out_t, ovf = ps.sample_planes_t(spec, imgs + salt, u_t, v_t, valid_t, bg)
        return jnp.sum(out_t)

    results["sampler(+plan)"] = round(timed(sampler, imgs, u_t, v_t), 3)
    print("sampler(+plan)", results["sampler(+plan)"], flush=True)

    # UV plane through the full path
    Wu, Hu = 1920, 1080
    cfg_uv = KernelConfig(width=Wu, height=Hu, output_width=Wu, output_height=Hu,
                          interpolation=8, distortion_model="opencv_fisheye",
                          plane_index=1, flags=FIX_COLOR_RANGE)
    fu = (Wu * 0.62, Wu * 0.62)
    dyn_uv = KernelDynamics.make(f=fu, c=(Wu / 2, Hu / 2),
                                 k=[0.25, -0.07, 0.02, -0.003], fov=fov,
                                 max_pixel_value=1023.0, pixel_value_limit=1023.0,
                                 background=(0, 0, 0, 1))
    img_uv = jnp.asarray(rng.uniform(0, 1023, (Hu, Wu, 2)).astype(np.float32))
    mats_uv = jnp.asarray(make_matrices(Wu, Hu, fu, fov, Hu))

    @jax.jit
    def full_uv(img, mats, salt):
        out, _ = remap.remap_plane_pallas(img + salt, mats, cfg_uv, dyn_uv,
                                          win_h=WIN[0], win_w=WIN[1],
                                          win_k=WIN[2], tile_h=TILE_H,
                                          tile_w=TILE_W)
        return jnp.sum(out)

    results["full UV"] = round(timed(full_uv, img_uv, mats_uv), 3)
    print("full UV", results["full UV"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

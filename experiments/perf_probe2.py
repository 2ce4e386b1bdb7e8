"""Stage breakdown for the 4K Y plane: coords kernel vs sampler kernel,
plus matmul-precision variants of the sampler.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe2.py
"""
import json
import math
import time

import numpy as np

from perf_probe import make_matrices, timed


def main():
    import jax
    import jax.numpy as jnp
    from gyroflow_tpu.ops import pallas_coords as pc
    from gyroflow_tpu.ops import pallas_sampler as ps
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    rng = np.random.default_rng(0)
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

    results = {}
    for tile_h, win in ((8, (40, 256)), (16, (48, 256))):
        spec = ps.SamplerSpec.create(height=H, width=W, out_height=H, out_width=W,
                                     interpolation=8, tile_h=tile_h,
                                     win_h=win[0], win_w=win[1])
        P = spec.tile_h * spec.tile_w
        ntiles = spec.grid[0] * spec.grid[1]

        # --- coords stage only (coords_pre in XLA + Pallas projection) ------
        @jax.jit
        def coords_only(img, mats, salt, _spec=spec):
            ox, oy, pad_ok = ps.tiled_grid(_spec)
            out_pos = jnp.stack([ox, oy], axis=-1)
            factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
            out_c = (W / 2.0, H / 2.0)
            out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)
            x, y, idx, _ = remap.coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
            nt = x.shape[0]
            u_t, v_t, valid_t, ov = pc.project_tiles(
                cfg, dyn, mats, x.reshape(nt, 1, P) + salt * 0,
                y.reshape(nt, 1, P), idx.reshape(nt, 1, P))
            return jnp.sum(u_t) + jnp.sum(v_t) + salt

        results[f"coords t{tile_h}"] = round(timed(coords_only, img, mats), 3)
        print(f"coords t{tile_h}", results[f"coords t{tile_h}"], flush=True)

        # --- precompute uv tiles, then time sampler alone -------------------
        @jax.jit
        def make_uv(img, mats, _spec=spec):
            ox, oy, pad_ok = ps.tiled_grid(_spec)
            out_pos = jnp.stack([ox, oy], axis=-1)
            factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
            out_c = (W / 2.0, H / 2.0)
            out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)
            x, y, idx, _ = remap.coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
            nt = x.shape[0]
            u_t, v_t, valid_t, ov = pc.project_tiles(
                cfg, dyn, mats, x.reshape(nt, 1, P), y.reshape(nt, 1, P),
                idx.reshape(nt, 1, P))
            u = u_t.reshape(nt, P)
            v = v_t.reshape(nt, P)
            valid = (valid_t.reshape(nt, P) > 0.5) & pad_ok
            uu, vv = remap.coords_post_uv(u, v, cfg)
            return uu, vv, valid

        u_t, v_t, valid_t = jax.block_until_ready(make_uv(img, mats))
        imgs = jnp.moveaxis(img, -1, 0)
        bg = jnp.zeros(1)

        @jax.jit
        def sampler_only(img4, u_t, v_t, valid_t, salt, _spec=spec):
            out_t, ov = ps.sample_planes_t(_spec, img4 + salt, u_t, v_t, valid_t, bg)
            return jnp.sum(out_t) + salt

        results[f"sampler t{tile_h} w{win[0]}"] = round(
            timed(sampler_only, imgs, u_t, v_t, valid_t), 3)
        print(f"sampler t{tile_h}", results[f"sampler t{tile_h} w{win[0]}"], flush=True)

        # --- window planning alone ------------------------------------------
        @jax.jit
        def plan_only(u_t, v_t, valid_t, salt, _spec=spec):
            y0s, x0s, _xo, _yo, ov = ps.plan_windows_t(_spec, u_t + salt * 0, v_t, valid_t)
            return jnp.sum(y0s) + jnp.sum(x0s) + salt

        results[f"plan t{tile_h}"] = round(timed(plan_only, u_t, v_t, valid_t), 3)
        print(f"plan t{tile_h}", results[f"plan t{tile_h}"], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

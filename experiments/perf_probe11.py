"""Probe 11: coords sub-stages at 4K — coords_pre (XLA probe chain),
plan_matrix_windows, and project_tiles at win_m in {16, 32, 64}.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe11.py
"""
import json

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
    mats = jnp.asarray(make_matrices(W, H, f, fov, H))

    TILE_H, TILE_W = 16, 96
    spec = ps.SamplerSpec.create(height=H, width=W, out_height=H, out_width=W,
                                 interpolation=8, tile_h=TILE_H, tile_w=TILE_W,
                                 win_h=24, win_w=256, win_k=128)
    out_c = (float(cfg.output_width) / 2.0, float(cfg.output_height) / 2.0)
    factor = max(1.0 - float(dyn.lens_correction_amount), 0.001)
    out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)

    @jax.jit
    def pre(mats, salt):
        ox, oy, pad_ok = ps.tiled_grid(spec)
        out_pos = jnp.stack([ox, oy], axis=-1)
        x, y, idx, _probe = remap.coords_pre(out_pos, mats + salt * 1e-9, cfg,
                                             dyn, out_c, out_f)
        return jnp.sum(x) + jnp.sum(y) + jnp.sum(idx)

    results["coords_pre"] = round(timed(pre, mats), 3)
    print("coords_pre", results["coords_pre"], flush=True)

    @jax.jit
    def pre_out(mats):
        ox, oy, pad_ok = ps.tiled_grid(spec)
        out_pos = jnp.stack([ox, oy], axis=-1)
        x, y, idx, _probe = remap.coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
        return x, y, idx

    x_t, y_t, idx_t = pre_out(mats)

    @jax.jit
    def planm(idx_t, salt):
        m0s, ovf = pc.plan_matrix_windows(idx_t + salt.astype(jnp.int32) * 0,
                                          64, mats.shape[0])
        return jnp.sum(m0s) + ovf.astype(jnp.int32)

    results["plan_matrix"] = round(timed(planm, idx_t), 3)
    print("plan_matrix", results["plan_matrix"], flush=True)

    for wm in (64, 32, 16):
        @jax.jit
        def proj(x_t, y_t, idx_t, salt, wm=wm):
            u, v, valid, ovf = pc.project_tiles(cfg, dyn, mats, x_t + salt * 0,
                                                y_t, idx_t, win_m=wm)
            return jnp.sum(u) + jnp.sum(v) + jnp.sum(valid) + ovf.astype(jnp.float32)

        # overflow check once
        _, _, _, ovf = jax.jit(lambda a, b, c, wm=wm: pc.project_tiles(
            cfg, dyn, mats, a, b, c, win_m=wm))(x_t, y_t, idx_t)
        results[f"project win_m={wm}"] = round(timed(proj, x_t, y_t, idx_t), 3)
        print(f"project win_m={wm}", results[f"project win_m={wm}"],
              "overflow", bool(ovf), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

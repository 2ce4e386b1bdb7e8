"""Probe 14: ablate the coords projection kernel's VPU chain at 4K.

Variants (same (G, P) layout, win_m=64):
  full        production rotate_and_distort_core
  no-atan     _atanf patched to identity
  no-distort  fisheye distort_xy patched to plain perspective divide
  no-stretch  input_h/v stretch where-divides removed (patched core tail)

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe14.py
"""
import json

import numpy as np

from perf_probe import make_matrices, timed


def main():
    import jax
    import jax.numpy as jnp
    from gyroflow_tpu.ops import distortion_models as dm
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

    spec = ps.SamplerSpec.create(height=H, width=W, out_height=H, out_width=W,
                                 interpolation=8, tile_h=16, tile_w=96,
                                 win_h=40, win_w=256, win_k=128)
    out_c = (float(cfg.output_width) / 2.0, float(cfg.output_height) / 2.0)
    factor = max(1.0 - float(dyn.lens_correction_amount), 0.001)
    out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)

    @jax.jit
    def pre_out(mats):
        ox, oy, pad_ok = ps.tiled_grid(spec)
        out_pos = jnp.stack([ox, oy], axis=-1)
        x, y, idx, _probe = remap.coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
        return x, y, idx

    x_t, y_t, idx_t = pre_out(mats)

    def time_proj(tag):
        # _coords_call caches on (cfg, win_m): monkeypatched cores would hit
        # the stale executable without this
        pc._coords_call.clear_cache()

        @jax.jit
        def proj(x_t, y_t, idx_t, salt):
            u, v, valid, ovf = pc.project_tiles(cfg, dyn, mats, x_t + salt * 0,
                                                y_t, idx_t, win_m=64)
            return jnp.sum(u) + jnp.sum(v) + jnp.sum(valid) + ovf.astype(jnp.float32)
        results[tag] = round(timed(proj, x_t, y_t, idx_t), 3)
        print(tag, results[tag], flush=True)

    time_proj("full")

    orig_atan = dm._atanf
    dm._atanf = lambda x: x
    try:
        time_proj("no-atan")
    finally:
        dm._atanf = orig_atan

    orig_model = dm.MODELS["opencv_fisheye"]
    dm.MODELS["opencv_fisheye"] = orig_model._replace(
        distort_xy=lambda x, y, z, p: (x / z, y / z))
    try:
        time_proj("no-distort")
    finally:
        dm.MODELS["opencv_fisheye"] = orig_model

    orig_core = remap.rotate_and_distort_core

    def core_no_m(px, py, m, cfg2, dyn2, lp, mesh=None):
        # matrix apply only: measures the one-hot gather + 9 mul-add floor
        _x = px * m[0] + py * m[1] + m[2]
        _y = px * m[3] + py * m[4] + m[5]
        _w = px * m[6] + py * m[7] + m[8]
        return _x + _y, _w, _w > 0.0

    remap.rotate_and_distort_core = core_no_m
    try:
        time_proj("matrix-only")
    finally:
        remap.rotate_and_distort_core = orig_core

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

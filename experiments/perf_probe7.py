"""Probe 7: what is inside the 2.6 ms coords_pre XLA fusion for the Y plane?

(a) full coords_pre (probe + idx + maps)
(b) no-probe variant (single matrix -> no center projection)
(c) probe projection alone (rotate_and_distort_core at center matrix)
(d) coords_pre with idx only as output (x,y dead)

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe7.py
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from perf_probe import make_matrices, timed


def main():
    from gyroflow_tpu.ops import pallas_sampler as ps
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

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
                                 win_h=48, win_w=256, win_k=128)
    ox, oy, pad_ok = ps.tiled_grid(spec)
    out_pos = jnp.stack([ox, oy], axis=-1)
    factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
    out_c = (W / 2.0, H / 2.0)
    out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)

    results = {}

    @jax.jit
    def full_pre(mats, salt):
        x, y, idx, _ = remap.coords_pre(out_pos + salt * 0, mats, cfg, dyn, out_c, out_f)
        return jnp.sum(x) + jnp.sum(y) + jnp.sum(idx) + salt

    results["full coords_pre"] = round(timed(full_pre, mats), 3)
    print("full coords_pre", results["full coords_pre"], flush=True)

    @jax.jit
    def no_probe(mats, salt):
        x, y, idx, _ = remap.coords_pre(out_pos + salt * 0, mats[:1], cfg, dyn, out_c, out_f)
        return jnp.sum(x) + jnp.sum(y) + jnp.sum(idx) + salt

    results["no-probe (1 matrix)"] = round(timed(no_probe, mats), 3)
    print("no-probe", results["no-probe (1 matrix)"], flush=True)

    @jax.jit
    def probe_only(mats, salt):
        center = mats.shape[0] // 2
        mc = [mats[center, i] for i in range(14)]
        lp = remap._lens_params(cfg, dyn)
        pu, pv, pvalid = remap.rotate_and_distort_core(
            ox + salt * 0, oy, mc, cfg, dyn, lp)
        return jnp.sum(pv) + jnp.sum(pvalid) + salt

    results["probe projection alone"] = round(timed(probe_only, mats), 3)
    print("probe alone", results["probe projection alone"], flush=True)

    @jax.jit
    def idx_only(mats, salt):
        x, y, idx, _ = remap.coords_pre(out_pos + salt * 0, mats, cfg, dyn, out_c, out_f)
        return jnp.sum(idx) + salt

    results["idx only (x,y dead)"] = round(timed(idx_only, mats), 3)
    print("idx only", results["idx only (x,y dead)"], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

"""Probe 15: decompose the coords kernel's 3.4 ms infrastructure cost.

Monkeypatches pc._coords_kernel with stripped variants (same signature and
grid), then times pc.project_tiles:
  io-floor  read x/y, write u=x, v=y, valid=1 (no DMA/E/dots/concats)
  dma-only  + the 8 matrix-window DMAs (window summed trivially)
  e-build   + the 8 one-hot E builds (no dots)
  dots      + the 16 dot_generals (m_mat summed, no per-row concats)
  full      production kernel (matrix apply + distort chain)

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe15.py
"""
import json

import numpy as np

from perf_probe import make_matrices, timed


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gyroflow_tpu.ops import pallas_coords as pc
    from gyroflow_tpu.ops import pallas_sampler as ps
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    SUBLANE = 8
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

    def make_variant(level):
        def kern(cfg2, win_m, G, m0_ref, mats_ref, x_ref, y_ref, idx_ref,
                 par_ref, u_out, v_out, valid_out, matwin_ref, sems):
            g = pl.program_id(0)
            P = x_ref.shape[-1]

            def win_dma(j):
                m0 = pl.multiple_of(m0_ref[g * G + j], SUBLANE)
                return pltpu.make_async_copy(mats_ref.at[pl.ds(m0, win_m), :],
                                             matwin_ref.at[j], sems.at[j])

            acc = None
            if level >= 1:
                for j in range(G):
                    win_dma(j).start()
                rid = jax.lax.broadcasted_iota(jnp.int32, (win_m, P), 0)
                for j in range(G):
                    idx = idx_ref[0, j:j + 1]
                    m0 = pl.multiple_of(m0_ref[g * G + j], SUBLANE)
                    win_dma(j).wait()
                    if level == 1:
                        s = matwin_ref[j, 0:1, :1] * 0.0   # keep DMA live
                        continue
                    idx_rel = idx - m0
                    E = (rid == idx_rel).astype(jnp.float32)
                    if level == 2:
                        s = jnp.sum(E, axis=0, keepdims=True)
                        acc = s if acc is None else acc + s
                        continue
                    matwin = matwin_ref[j, :, :16]
                    mat_hi = matwin.astype(jnp.bfloat16).astype(jnp.float32)
                    mat_lo = matwin - mat_hi
                    dn = (((0,), (0,)), ((), ()))
                    m_mat = (jax.lax.dot_general(
                                 mat_hi, E, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
                             + jax.lax.dot_general(
                                 mat_lo, E, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32))
                    s = jnp.sum(m_mat, axis=0, keepdims=True)
                    acc = s if acc is None else acc + s

            px, py = x_ref[0], y_ref[0]
            if acc is not None:
                u_out[0] = px + acc
            else:
                u_out[0] = px
            v_out[0] = py
            valid_out[0] = jnp.ones_like(px)
        return kern

    orig = pc._coords_kernel

    def time_level(level, tag):
        pc._coords_call.clear_cache()
        if level is None:
            pc._coords_kernel = orig
        else:
            pc._coords_kernel = make_variant(level)

        @jax.jit
        def go(x_t, y_t, idx_t, salt):
            u, v, valid, ovf = pc.project_tiles(cfg, dyn, mats, x_t + salt * 0,
                                                y_t, idx_t, win_m=64)
            return jnp.sum(u) + jnp.sum(v) + jnp.sum(valid) + ovf.astype(jnp.float32)

        results[tag] = round(timed(go, x_t, y_t, idx_t), 3)
        print(tag, results[tag], flush=True)

    try:
        for level, tag in ((0, "io-floor"), (1, "dma-only"), (2, "e-build"),
                           (3, "dots"), (None, "full")):
            time_level(level, tag)
    finally:
        pc._coords_kernel = orig
        pc._coords_call.clear_cache()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

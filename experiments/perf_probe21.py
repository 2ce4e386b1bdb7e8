"""Probe 21 (round 4): fused projection+sampling kernel vs split kernels.

On the real chip at the bench geometry: (a) bit-exactness of the fused path
vs the split path, (b) full Y+UV frame-step time both ways.

Run: python experiments/perf_probe21.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_matrices  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

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

    win = (40, 256, 128, 96, 32)
    TILE_H = 16

    # ---- parity on the Y plane ----
    cfg0, dyn0, y_img, y_mats = planes[0]
    a, ova = remap.remap_plane_pallas_jit(y_img, y_mats, cfg0, dyn0, None,
                                          win_h=win[0], win_w=win[1],
                                          win_k=win[2], tile_w=win[3],
                                          tile_h=TILE_H, win_r=win[4],
                                          fused=False)
    b, ovb = remap.remap_plane_pallas_jit(y_img, y_mats, cfg0, dyn0, None,
                                          win_h=win[0], win_w=win[1],
                                          win_k=win[2], tile_w=win[3],
                                          tile_h=TILE_H, win_r=win[4],
                                          fused=True)
    an, bn = np.asarray(a), np.asarray(b)
    print(f"Y parity: ov split={bool(ova)} fused={bool(ovb)} "
          f"maxdiff={np.max(np.abs(an - bn))} exact={np.array_equal(an, bn)}")

    # ---- full-step timing both ways ----
    def make_step(fused):
        @jax.jit
        def run_frame(y, yl, uv, uvm, salt):
            out_y, ov0 = remap.remap_plane_pallas(
                y + salt, yl, planes[0][0], planes[0][1], win_h=win[0],
                win_w=win[1], win_k=win[2], tile_w=win[3], tile_h=TILE_H,
                win_r=win[4], fused=fused)
            out_uv, ov1 = remap.remap_plane_pallas(
                uv + salt, uvm, planes[1][0], planes[1][1], win_h=win[0],
                win_w=win[1], win_k=win[2], tile_w=win[3], tile_h=TILE_H,
                win_r=win[4], fused=fused)
            return jnp.sum(out_y) + jnp.sum(out_uv) + salt, ov0 | ov1
        return run_frame

    uv_img, uv_mats = planes[1][2], planes[1][3]
    B = 24
    salts = [jnp.float32(i * 1e-6) for i in range(B)]
    for fused in (False, True):
        step = make_step(fused)
        out, ov = step(y_img, y_mats, uv_img, uv_mats, jnp.float32(0.0))
        assert not bool(ov), f"overflow fused={fused}"
        float(out)
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [step(y_img, y_mats, uv_img, uv_mats, salts[i])
                    for i in range(B)]
            float(outs[-1][0])
            dt = (time.time() - t0) / B
            best = dt if best is None else min(best, dt)
        print(f"fused={fused}: {best*1000:.2f} ms/frame ({1/best:.1f} fps)")


if __name__ == "__main__":
    main()

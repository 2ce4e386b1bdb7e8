"""Probe 26 (round 5): steady-state scan-window wall + coords win_m sweep.

Probe 23 (r5 re-run): issue-only 0.1 ms/call, per-frame wall 9.06-9.24 ms,
but the F=8 scan program's DEVICE span is 7.95 ms/frame — ~1.1 ms/frame of
inter-program device idle on the axon tunnel that windowed dispatch should
hide. Probe 22's F=16 timing used calls=2, so the first program's launch
was amortized over only 32 frames. Here:
  1. B scan F=16 with calls=8 (128 frames/rep) — steady state.
  2. win_m sweep {16, 32, 64} through the full frame step: the Y coords
     kernel is 1.94 ms/frame (24% of the step) and its 16 hi/lo gather
     dot_generals contract K=win_m (probe15 put them at 1.13 ms at
     win_m=64; probe14's "win_m-insensitive" verdict predates band_mode=1
     and the DMA-wait reorder).

Run: python experiments/perf_probe26.py
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
        mats = np.asarray(make_matrices(W, H, f, fov, H))
        planes.append((cfg, dyn, img, mats))

    win = (40, 256, 128, 96, 32)
    TILE_H = 16
    (cfg_y, dyn_y, y_img, y_mats0) = planes[0]
    (cfg_uv, dyn_uv, uv_img, uv_mats0) = planes[1]

    def step(y, yl, uv, uvm, salt, wm=0):
        out_y, _ = remap.remap_plane_pallas(y + salt, yl, cfg_y, dyn_y,
                                            win_h=win[0], win_w=win[1],
                                            win_k=win[2], tile_w=win[3],
                                            tile_h=TILE_H, win_r=win[4],
                                            win_m=wm)
        out_uv, _ = remap.remap_plane_pallas(uv + salt, uvm, cfg_uv, dyn_uv,
                                             win_h=win[0], win_w=win[1],
                                             win_k=win[2], tile_w=win[3],
                                             tile_h=TILE_H, win_r=win[4],
                                             win_m=wm)
        return jnp.sum(out_y) + jnp.sum(out_uv) + salt

    yl = jnp.asarray(y_mats0)
    uvm = jnp.asarray(uv_mats0)

    # 1. per-frame baseline + win_m sweep
    for wm in (0, 32, 16):
        run_frame = jax.jit(lambda y, yl, uv, uvm, s, _wm=wm:
                            step(y, yl, uv, uvm, s, wm=_wm))
        salts = [jnp.float32(i * 1e-6) for i in range(24)]
        out0, _ = remap.remap_plane_pallas(y_img, yl, cfg_y, dyn_y,
                                           win_h=win[0], win_w=win[1],
                                           win_k=win[2], tile_w=win[3],
                                           tile_h=TILE_H, win_r=win[4],
                                           win_m=wm)
        float(jax.block_until_ready(run_frame(y_img, yl, uv_img, uvm,
                                              salts[0])))
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [run_frame(y_img, yl, uv_img, uvm, salts[i])
                    for i in range(24)]
            jax.block_until_ready(outs[-1])
            dt = (time.time() - t0) / 24
            best = dt if best is None else min(best, dt)
        # parity vs wm=0 on the Y plane
        if wm == 0:
            ref_y = np.asarray(out0)
            tag = ""
        else:
            diff = float(np.max(np.abs(np.asarray(out0) - ref_y)))
            tag = f"  maxdiff={diff:.4f}"
        print(f"per-frame win_m={wm or 64}: {best*1000:6.2f} ms/frame "
              f"({1.0/best:6.1f} fps){tag}", flush=True)

    # 2. steady-state scan windows
    for F, calls in ((8, 12), (16, 8), (32, 4)):
        yl_f = jnp.asarray(np.stack([y_mats0] * F))
        uvm_f = jnp.asarray(np.stack([uv_mats0] * F))
        salts_f = [jnp.arange(F, dtype=jnp.float32) * 1e-6 + i * 1e-3
                   for i in range(4)]

        @jax.jit
        def run_window(y, uv, yls, uvms, ss):
            def body(acc, xs):
                yl_i, uvm_i, s_i = xs
                return acc + step(y, yl_i, uv, uvm_i, s_i), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (yls, uvms, ss))
            return acc

        args = [(y_img, uv_img, yl_f, uvm_f, s) for s in salts_f]
        float(jax.block_until_ready(run_window(*args[0])))
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [run_window(*args[i % 4]) for i in range(calls)]
            jax.block_until_ready(outs[-1])
            dt = (time.time() - t0) / (calls * F)
            best = dt if best is None else min(best, dt)
        print(f"B scan F={F} (calls={calls}): {best*1000:6.2f} ms/frame "
              f"({1.0/best:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()

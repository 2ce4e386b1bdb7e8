"""Probe 22 (round 4): amortize host dispatch with in-graph frame windows.

Probe 19 re-trace: device step = 8.44 ms/frame, but bench wall = 9.45 ms
(105.8 fps) — the axon tunnel's per-dispatch host cost (~1-2.5 ms RPC)
starves the queue now that the device step dropped below it. The r3
windowed-dispatch probe (window_dispatch_probe.py) measured windows SLOWER,
but that was when the step was device-bound at 63 fps AND it stacked
distinct (F, H, W, C) frame operands (per-slice copies in-program).

Variants at the bench geometry (4K 10-bit YUV420 lanczos4 per-row RS):
  A. per-frame dispatch (bench.py today)
  B. F=8 window, ONE jit call: lax.scan over (F,) salts + (F, H, 14)
     per-frame matrix stacks, same image operands (no frame stacking)
  C. F=8 window, unrolled python loop in-graph (no scan) — XLA sees 8
     independent steps, may pipeline better than scan's sequential carry
  D. B but F=16

Run on the real chip: python experiments/perf_probe22.py
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

    win_y = (40, 256, 128, 96, 32)
    win_uv = (40, 256, 128, 96, 32)
    TILE_H = 16
    (cfg_y, dyn_y, y_img, y_mats0) = planes[0]
    (cfg_uv, dyn_uv, uv_img, uv_mats0) = planes[1]

    def step(y, yl, uv, uvm, salt):
        out_y, _ = remap.remap_plane_pallas(y + salt, yl, cfg_y, dyn_y,
                                            win_h=win_y[0], win_w=win_y[1],
                                            win_k=win_y[2], tile_w=win_y[3],
                                            tile_h=TILE_H, win_r=win_y[4])
        out_uv, _ = remap.remap_plane_pallas(uv + salt, uvm, cfg_uv, dyn_uv,
                                             win_h=win_uv[0], win_w=win_uv[1],
                                             win_k=win_uv[2], tile_w=win_uv[3],
                                             tile_h=TILE_H, win_r=win_uv[4])
        return jnp.sum(out_y) + jnp.sum(out_uv) + salt

    def time_variant(name, fn, n_frames_per_call, args_list, reps=3, calls=12):
        # warm up
        float(jax.block_until_ready(fn(*args_list[0])))
        best = None
        for _ in range(reps):
            t0 = time.time()
            outs = [fn(*args_list[i % len(args_list)]) for i in range(calls)]
            jax.block_until_ready(outs[-1])
            dt = (time.time() - t0) / (calls * n_frames_per_call)
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best*1000:6.2f} ms/frame  ({1.0/best:6.1f} fps)")
        return best

    # A: per-frame dispatch
    run_frame = jax.jit(step)
    salts = [jnp.float32(i * 1e-6) for i in range(24)]
    yl = jnp.asarray(y_mats0)
    uvm = jnp.asarray(uv_mats0)
    time_variant("A per-frame", run_frame, 1,
                 [(y_img, yl, uv_img, uvm, salts[i]) for i in range(24)],
                 calls=24)

    # B/D: scan window (per-frame matrices stacked, same images)
    def make_scan(F):
        yl_f = jnp.asarray(np.stack([y_mats0] * F))      # (F, H, 14)
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

        return run_window, [(y_img, uv_img, yl_f, uvm_f, s) for s in salts_f]

    for F in (8, 16):
        fn, args = make_scan(F)
        time_variant(f"B scan F={F}", fn, F, args, calls=4 if F == 8 else 2)

    # C: unrolled in-graph loop F=8
    F = 8
    yl_f = jnp.asarray(np.stack([y_mats0] * F))
    uvm_f = jnp.asarray(np.stack([uv_mats0] * F))
    salts_f = [jnp.arange(F, dtype=jnp.float32) * 1e-6 + i * 1e-3
               for i in range(4)]

    @jax.jit
    def run_unrolled(y, uv, yls, uvms, ss):
        acc = jnp.float32(0.0)
        for i in range(F):
            acc = acc + step(y, yls[i], uv, uvms[i], ss[i])
        return acc

    time_variant("C unroll F=8", run_unrolled, F,
                 [(y_img, uv_img, yl_f, uvm_f, s) for s in salts_f], calls=4)


if __name__ == "__main__":
    main()

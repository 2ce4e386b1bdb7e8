"""Probe 28 (round 5): fused Y+UV window program with distinct uint16 frames.

Probe 27: the per-plane production window (two scan programs per window)
measures 9.10 ms/frame vs probe 26's 8.16 for ONE program scanning both
planes. Isolate the gap: (a) one program, both planes per scan iteration,
distinct stacked uint16 frames, uint16 outs — the shape a fused-plane
process_pixels_window would run; (b) same with f32 io (cast cost).

Run: python experiments/perf_probe28.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_matrices  # noqa: E402

F = 16


def main():
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import (FIX_COLOR_RANGE, KernelConfig,
                                                KernelDynamics)

    rng = np.random.default_rng(0)
    win = (40, 256, 128, 96, 16, 32)
    wh, ww, wk, tw, th, wr = win

    cfgs, dyns, imgs_h, mats_h = [], [], [], []
    for (W, H, plane_index, kchan) in ((3840, 2160, 0, 1), (1920, 1080, 1, 2)):
        f = (W * 0.62, W * 0.62)
        cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                           interpolation=8, distortion_model="opencv_fisheye",
                           plane_index=plane_index, flags=FIX_COLOR_RANGE)
        dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2),
                                  k=[0.25, -0.07, 0.02, -0.003], fov=0.92,
                                  max_pixel_value=1023.0,
                                  pixel_value_limit=1023.0,
                                  background=(0, 0, 0, 1))
        cfgs.append(cfg)
        dyns.append(dyn)
        imgs_h.append(rng.integers(0, 1024, (F, H, W, kchan)).astype(np.uint16))
        m = np.stack([np.asarray(make_matrices(W, H, f, 0.92, H))] * F)
        for i in range(F):
            m[i, :, :9] *= (1.0 + 1e-4 * i)
        mats_h.append(m)

    cfg_y, cfg_uv = cfgs
    dyn_y, dyn_uv = dyns

    def one_frame(y_i, uv_i, my_i, muv_i, as_u16):
        oy, _ = remap.remap_plane_pallas(y_i.astype(jnp.float32), my_i,
                                         cfg_y, dyn_y, win_h=wh, win_w=ww,
                                         win_k=wk, tile_w=tw, tile_h=th,
                                         win_r=wr)
        ouv, _ = remap.remap_plane_pallas(uv_i.astype(jnp.float32), muv_i,
                                          cfg_uv, dyn_uv, win_h=wh, win_w=ww,
                                          win_k=wk, tile_w=tw, tile_h=th,
                                          win_r=wr)
        if as_u16:
            oy = jnp.clip(jnp.rint(oy), 0, 1023.0).astype(jnp.uint16)
            ouv = jnp.clip(jnp.rint(ouv), 0, 1023.0).astype(jnp.uint16)
        return oy, ouv

    for tag, as_u16, cast_in in (("uint16 io", True, True),
                                 ("f32 io", False, False)):
        if cast_in:
            ys = jnp.asarray(imgs_h[0])
            uvs = jnp.asarray(imgs_h[1])
        else:
            ys = jnp.asarray(imgs_h[0].astype(np.float32))
            uvs = jnp.asarray(imgs_h[1].astype(np.float32))
        mys = jnp.asarray(mats_h[0])
        muvs = jnp.asarray(mats_h[1])

        @jax.jit
        def run_window(ys, uvs, mys, muvs):
            def body(_, xs):
                y_i, uv_i, my_i, muv_i = xs
                return None, one_frame(y_i, uv_i, my_i, muv_i, as_u16)
            _, outs = jax.lax.scan(body, None, (ys, uvs, mys, muvs))
            # scalar sync handle: float() on it provably drains the queue
            # (block_until_ready on big tunnel arrays returns early)
            return outs, jnp.sum(outs[1][-1].astype(jnp.float32))

        outs, s = run_window(ys, uvs, mys, muvs)
        float(s)
        best = None
        for _ in range(3):
            t0 = time.time()
            for _ in range(4):
                outs, s = run_window(ys, uvs, mys, muvs)
            float(s)
            dt = (time.time() - t0) / (4 * F)
            best = dt if best is None else min(best, dt)
        print(f"fused-plane window F={F} ({tag}): {best*1000:6.2f} ms/frame "
              f"({1.0/best:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()

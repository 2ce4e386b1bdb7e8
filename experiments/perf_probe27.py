"""Probe 27 (round 5): production window step, 1-device mesh, real chip.

Probe 26: a lax.scan window reaches 8.16 ms/frame steady-state vs 9.0 for
per-frame dispatch — the ~1 ms/frame inter-program device idle on the axon
tunnel amortizes away. make_window_step now scans. This probe drives the
PRODUCTION window step (stabilize-window shape: distinct stacked uint16
frames in, uint16 stacked outputs, per-frame dyns, Y then UV) on a 1-device
mesh and reports ms/frame — the honest windowed-production number, and
checks the window output matches the per-frame remap path bit-exactly.

Run: python experiments/perf_probe27.py
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
    from gyroflow_tpu.parallel import pipeline as pp

    rng = np.random.default_rng(0)
    mesh = pp.make_frame_mesh(1, sp=1)
    win = (40, 256, 128, 96, 16, 32)

    planes = []
    for (W, H, plane_index, kchan) in ((3840, 2160, 0, 1), (1920, 1080, 1, 2)):
        f = (W * 0.62, W * 0.62)
        fov = 0.92
        cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                           interpolation=8, distortion_model="opencv_fisheye",
                           plane_index=plane_index, flags=FIX_COLOR_RANGE)
        dyns = pp.stack_dynamics([
            KernelDynamics.make(f=f, c=(W / 2, H / 2),
                                k=[0.25, -0.07, 0.02, -0.003], fov=0.92,
                                max_pixel_value=1023.0,
                                pixel_value_limit=1023.0,
                                background=(0, 0, 0, 1))
            for _ in range(F)])
        imgs = rng.integers(0, 1024, (F, H, W, kchan)).astype(np.uint16)
        mats = np.stack([np.asarray(make_matrices(W, H, f, 0.92, H))] * F)
        # make per-frame geometry distinct (rotate fov per frame slightly)
        for i in range(F):
            mats[i, :, :9] *= (1.0 + 1e-4 * i)
        planes.append((cfg, dyns, imgs, mats))

    steps = []
    device_args = []
    for (cfg, dyns, imgs, mats) in planes:
        step = pp.make_window_step(mesh, cfg, F, win=win, use_pallas=True,
                                   out_dtype=jnp.uint16)
        a = pp.place_window(mesh, imgs, mats, dyns)
        steps.append(step)
        device_args.append(a)

    def run_window_pair():
        outs = []
        for step, (imgs_d, mats_d, dyns_d, _) in zip(steps, device_args):
            out, ov = step(imgs_d, mats_d, dyns_d)
            outs.append((out, ov))
        return outs

    # warm-up + overflow check
    outs = run_window_pair()
    for _, ov in outs:
        assert not bool(np.asarray(ov).any()), "window overflowed"

    # parity vs the per-frame jitted path (frame 3, Y plane)
    (cfg_y, dyns_y, imgs_y, mats_y) = planes[0]
    dyn3 = jax.tree.map(lambda x: np.asarray(x[3]), dyns_y)
    ref, _ = remap.remap_plane_pallas_jit(
        jnp.asarray(imgs_y[3].astype(np.float32)), jnp.asarray(mats_y[3]),
        cfg_y, dyn3, None, win_h=win[0], win_w=win[1], win_k=win[2],
        tile_w=win[3], tile_h=win[4], win_r=win[5], out_dtype="uint16")
    got = np.asarray(outs[0][0][3])
    diff = np.max(np.abs(ref.astype(np.int32) - got.astype(np.int32)))
    print(f"window-vs-single parity (uint16 codes): max diff = {diff}",
          flush=True)

    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(4):
            outs = run_window_pair()
        jax.block_until_ready(outs[-1][0])
        dt = (time.time() - t0) / (4 * F)
        best = dt if best is None else min(best, dt)
    print(f"production window step (F={F}, uint16 io, distinct frames): "
          f"{best*1000:6.2f} ms/frame ({1.0/best:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()

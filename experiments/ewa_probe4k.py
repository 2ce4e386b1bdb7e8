"""EWA elliptical kernel timing at 1080p AND 4K (round 4, post hi/lo M-stack).

VERDICT r3 next-step #3: the r3 band-space EWA measured 10.7 ms 1080p but
only a PRE-Estrin 48.2 ms at 4K (the tunnel dropped before the re-measure).
Round 4 also M-stacked the hi/lo colmix passes into ONE matmul call (the
kernel is weight-load-fill bound: N = P = 768 takes 6 weight tiles, and two
separate calls paid every fill twice). This probe walks the production
EWA_WINDOW_LADDER (first non-overflowing rung) and times the full
remap_plane_pallas step at both sizes, with per-row RS matrices like the
primary bench.

Run on the real chip: python experiments/ewa_probe4k.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_matrices  # noqa: E402


def run_size(W, H, frames, k=None, tag=""):
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import (FIX_COLOR_RANGE, KernelConfig,
                                                KernelDynamics)
    from gyroflow_tpu.ops.remap import ewa_coeffs
    from gyroflow_tpu.parallel.pipeline import ladder_for

    rng = np.random.default_rng(0)
    f = (W * 0.62, W * 0.62)
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=11, distortion_model="opencv_fisheye",
                       flags=FIX_COLOR_RANGE)
    pw, qw = ewa_coeffs(11)
    if k is None:
        k = [0.25, -0.07, 0.02, -0.003]
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2),
                              k=k, fov=0.92,
                              max_pixel_value=1023.0, pixel_value_limit=1023.0,
                              background=(0, 0, 0, 1),
                              ewa_coeffs_p=pw, ewa_coeffs_q=qw)
    img = jnp.asarray(rng.uniform(0, 1023.0, (H, W, 1)).astype(np.float32))
    mats = jnp.asarray(make_matrices(W, H, f, 0.92, H))

    win = None
    for cand in ladder_for(cfg):
        out, ov = remap.remap_plane_pallas_jit(
            img, mats, cfg, dyn, None, win_h=cand[0], win_w=cand[1],
            win_k=cand[2], tile_w=cand[3], tile_h=cand[4], win_r=cand[5],
            ewa_cap=cand[6] if len(cand) > 6 else 4,
            ewa_cap_y=cand[7] if len(cand) > 7 else 4)
        if not bool(ov):
            win = cand
            break
    if win is None:
        print(f"{W}x{H}: ALL RUNGS OVERFLOW")
        return

    @jax.jit
    def step(y, m, salt):
        out, ov = remap.remap_plane_pallas(
            y + salt, m, cfg, dyn, None, win_h=win[0], win_w=win[1],
            win_k=win[2], tile_w=win[3], tile_h=win[4], win_r=win[5],
            ewa_cap=win[6] if len(win) > 6 else 4,
            ewa_cap_y=win[7] if len(win) > 7 else 4)
        return jnp.sum(out), ov

    s, ov = step(img, mats, jnp.float32(0.0))
    assert not bool(ov)
    float(s)
    salts = [jnp.float32(i * 1e-6) for i in range(frames)]
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [step(img, mats, salts[i]) for i in range(frames)]
        float(outs[-1][0])
        dt = (time.time() - t0) / frames
        best = dt if best is None else min(best, dt)
    print(f"{W}x{H}{tag} interp-11 rung {win}: {best * 1000:.2f} ms/frame "
          f"({1 / best:.1f} fps)", flush=True)


def main():
    # full fisheye (bench geometry): the periphery needs radius ~10 -> the
    # ladder settles on a legacy cap-4 rung
    run_size(1920, 1080, 16)
    run_size(3840, 2160, 8)
    # mild lens: effective radius 2 everywhere -> cap-2 rung (6-tap stencil)
    mild = [0.01, -0.002, 0.0, 0.0]
    run_size(1920, 1080, 16, k=mild, tag=" mild")
    run_size(3840, 2160, 8, k=mild, tag=" mild")


if __name__ == "__main__":
    main()

"""Probe 29 (round 5): 4K EWA device-op cost breakdown + forced-cap deltas.

The r3 verdict's EWA target (>=30 fps 4K) is still short: 4K interp-11 runs
~50 ms/frame on the legacy cap-4 rung (19.8 fps). The 1080p cap_x sweep only
bought 10% (13.1 -> 11.8 ms) despite cutting the tap loop 10 -> 6 iterations,
so the tap loop may NOT dominate. This probe:
  1. traces the 4K EWA step (cap-4 rung) and prints per-op device totals;
  2. times FORCED cap-2 / cap-3 rungs at 4K (escalation check bypassed via
     direct remap_plane_pallas window args) to measure what a per-tile cap
     escalation could recover;
  3. times the coords/jacobian stage alone (sampling ablated) to split
     coords vs sampler cost.

Run on the real chip: python experiments/perf_probe29.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_matrices  # noqa: E402
from perf_probe19 import parse_trace  # noqa: E402

TRACE_DIR = "/tmp/gf_trace_ewa4k"
FRAMES = 6


def build(W, H, win):
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import (FIX_COLOR_RANGE, KernelConfig,
                                                KernelDynamics)
    from gyroflow_tpu.ops.remap import ewa_coeffs

    rng = np.random.default_rng(0)
    f = (W * 0.62, W * 0.62)
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=11, distortion_model="opencv_fisheye",
                       flags=FIX_COLOR_RANGE)
    pw, qw = ewa_coeffs(11)
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2),
                              k=[0.25, -0.07, 0.02, -0.003], fov=0.92,
                              max_pixel_value=1023.0, pixel_value_limit=1023.0,
                              background=(0, 0, 0, 1),
                              ewa_coeffs_p=pw, ewa_coeffs_q=qw)
    img = jnp.asarray(rng.uniform(0, 1023.0, (H, W, 1)).astype(np.float32))
    mats = jnp.asarray(make_matrices(W, H, f, 0.92, H))

    @jax.jit
    def step(y, m, salt):
        out, ov = remap.remap_plane_pallas(
            y + salt, m, cfg, dyn, None, win_h=win[0], win_w=win[1],
            win_k=win[2], tile_w=win[3], tile_h=win[4], win_r=win[5],
            ewa_cap=win[6], ewa_cap_y=win[7])
        return jnp.sum(out), ov

    return img, mats, step


def time_step(img, mats, step, frames=FRAMES):
    import jax.numpy as jnp
    s, ov = step(img, mats, jnp.float32(0.0))
    float(s)
    ovb = bool(ov)
    salts = [jnp.float32(i * 1e-6) for i in range(frames)]
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [step(img, mats, salts[i]) for i in range(frames)]
        float(outs[-1][0])
        dt = (time.time() - t0) / frames
        best = dt if best is None else min(best, dt)
    return best, ovb


def main():
    import jax

    W, H = 3840, 2160
    legacy = (40, 256, 128, 96, 8, 32, 4, 4)
    img, mats, step = build(W, H, legacy)
    best, ovb = time_step(img, mats, step)
    print(f"4K cap-4 rung {legacy}: {best*1000:.2f} ms/frame "
          f"({1/best:.1f} fps) overflow={ovb}", flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    import jax.numpy as jnp
    salts = [jnp.float32(i * 1e-6) for i in range(FRAMES)]
    with jax.profiler.trace(TRACE_DIR):
        outs = [step(img, mats, salts[i]) for i in range(FRAMES)]
        float(outs[-1][0])
    totals, counts, path = parse_trace(TRACE_DIR)
    print(f"trace: {path}")
    print(f"{'op':<64} {'ms/frame':>9} {'count':>6}")
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    tot = 0.0
    for name, ms in rows[:24]:
        tot += ms
        print(f"{name[:64]:<64} {ms / FRAMES:9.3f} {counts[name]:6d}")
    print(f"sum of listed device ms/frame: {tot / FRAMES:.2f}", flush=True)

    # forced smaller caps (output wrong for escalated pixels - timing only;
    # overflow flag will be True because the cap check fires)
    for win in ((32, 256, 128, 96, 8, 24, 3, 4),
                (32, 256, 128, 96, 8, 24, 2, 4),
                (24, 256, 128, 96, 8, 16, 2, 2)):
        try:
            img2, mats2, st = build(W, H, win)
            best, ovb = time_step(img2, mats2, st)
            print(f"4K forced rung {win}: {best*1000:.2f} ms/frame "
                  f"({1/best:.1f} fps) overflow={ovb}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"4K forced rung {win}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

"""Probe 17: smaller rolled compute width Kw (win_k) for the sampler.

The r3 device trace puts the C-band one-hot build at 3.63 ms/frame (4K Y) —
the kernel's top cost — and shows it is vreg-write-bandwidth-bound: cost is
linear in the band height Kw (C is (Kw, P)). Current production rungs use
Kw=128 with tile_w=96 (source span ~96 + 8 taps fits 128). This probe times
the 4K Y plane with:
  - Kw=128 tile_w=96  (current best rung)
  - Kw=96  tile_w=96  (25% smaller band; span fits only when zoom >= ~1.0)
  - Kw=64  tile_w=48  (50% smaller band; doubles the tile count)
  - Kw=96  tile_w=64  (25% smaller band, 1.5x tiles, more span headroom)

Run on the real chip: python experiments/perf_probe17.py
"""
from __future__ import annotations

import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import make_matrices  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import (FIX_COLOR_RANGE, KernelConfig,
                                                KernelDynamics)

    rng = np.random.default_rng(0)
    W, H = 3840, 2160
    f = (W * 0.62, W * 0.62)
    fov = 0.92
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=8, distortion_model="opencv_fisheye",
                       plane_index=0, flags=FIX_COLOR_RANGE)
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2),
                              k=[0.25, -0.07, 0.02, -0.003], fov=fov,
                              max_pixel_value=1023.0, pixel_value_limit=1023.0,
                              background=(0, 0, 0, 1))
    img = jnp.asarray(rng.uniform(0, 1023, (H, W, 1)).astype(np.float32))
    mats = jnp.asarray(make_matrices(W, H, f, fov, H))

    # (win_h, win_w, win_k, tile_w, tile_h, win_r)
    cands = {
        "k128 tw96 (prod)": (40, 256, 128, 96, 16, 32),
        "k96  tw96": (40, 256, 96, 96, 16, 32),
        "k96  tw64": (40, 256, 96, 64, 16, 32),
        "k64  tw48": (40, 256, 64, 48, 16, 32),
        "k64  tw48 h32": (32, 256, 64, 48, 16, 24),
    }

    B = 16
    for name, cand in cands.items():
        wh, ww, wk, tw, th, wr = cand

        def run(y, m, salt, _c=cand):
            out, ov = remap.remap_plane_pallas(
                y + salt, m, cfg, dyn, win_h=_c[0], win_w=_c[1], win_k=_c[2],
                tile_w=_c[3], tile_h=_c[4], win_r=_c[5])
            return jnp.sum(out), ov

        run_j = jax.jit(run)
        try:
            s, ov = run_j(img, mats, jnp.float32(0.0))
            float(s)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        if bool(ov):
            print(f"{name}: OVERFLOW (span exceeds Kw at this geometry)")
            continue
        salts = [jnp.float32(i * 1e-6) for i in range(B)]
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [run_j(img, mats, salts[i]) for i in range(B)]
            float(outs[-1][0])
            dt = (time.time() - t0) / B
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best * 1000:.2f} ms/frame Y  ({1.0 / best:.1f} fps)")


if __name__ == "__main__":
    main()

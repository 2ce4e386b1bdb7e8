"""Probe 18: mod-8 band build (single compare+select) vs blocked two-select.

The r3 device trace puts the banded one-hot builds at 5.1 ms of the 14.4
ms/frame step (C 3.63 + R 1.46, 4K Y) and shows they are vreg-write-bound:
cost follows the number of (S, P)-scale materialization passes, not the vreg
count (probe 17). The blocked form pays ~6 passes (A0/A1 compare-broadcasts,
Ue/Ve broadcasts, 2 selects). The mod-8 identity

    c - rel in [0, 8)  <=>  cH == fH + (cL < s),  and there
    c - rel == (cL - s) & 7

collapses that to ONE compare + ONE select at (S, P) scale (plus two
broadcast materializations of (8, P) operands): band = where(bH == tH, Um, 0)
with Um = ws[(cL - s) & 7] and tH = fH + (cL < s) both built on (8, P).

Run on the real chip: python experiments/perf_probe18.py
"""
from __future__ import annotations

import os
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

    cand = (40, 256, 128, 96, 16, 32)   # production 4K rung
    B = 16
    results = {}
    full = {}
    for mode in (0, 1):
        os.environ["GF_BAND_MODE"] = str(mode)

        def run(y, m, salt, _c=cand):
            out, ov = remap.remap_plane_pallas(
                y + salt, m, cfg, dyn, win_h=_c[0], win_w=_c[1], win_k=_c[2],
                tile_w=_c[3], tile_h=_c[4], win_r=_c[5])
            return jnp.sum(out), jnp.sum(out[1000, 2000]), ov

        run_j = jax.jit(run)
        s, px, ov = run_j(img, mats, jnp.float32(0.0))
        results[mode] = (float(s), float(px))
        assert not bool(ov)

        def run_full(y, m, _c=cand):
            out, ov = remap.remap_plane_pallas(
                y, m, cfg, dyn, win_h=_c[0], win_w=_c[1], win_k=_c[2],
                tile_w=_c[3], tile_h=_c[4], win_r=_c[5])
            return out, ov

        out_full, _ = jax.jit(run_full)(img, mats)
        full[mode] = np.asarray(out_full)
        salts = [jnp.float32(i * 1e-6) for i in range(B)]
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [run_j(img, mats, salts[i]) for i in range(B)]
            float(outs[-1][0])
            dt = (time.time() - t0) / B
            best = dt if best is None else min(best, dt)
        print(f"band_mode={mode}: {best * 1000:.2f} ms/frame Y "
              f"({1.0 / best:.1f} fps)  sum={results[mode][0]:.1f}")
    assert np.array_equal(full[0], full[1]), (
        "band_mode 0 vs 1 full-frame mismatch: max abs diff "
        f"{np.max(np.abs(full[0] - full[1]))}")
    print("full-frame bit-exact: mode0 == mode1 (np.array_equal)")


if __name__ == "__main__":
    main()

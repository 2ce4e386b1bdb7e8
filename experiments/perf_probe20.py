"""Probe 20 (round 4): window/tile sweep AFTER the mod-8 band build.

The r2/r3 sweeps that fixed tile_h=16, win_k=128/tile_w=96 predate probe
18's mod-8 band build, which cut the dominant (S, P)-scale VPU cost ~3x.
The cost model changed:
  colmix FLOPs  ~ pixels * Kw * Kh-ish (M = C*Kh per tile, K = Kw)
  C band build  ~ pixels * Kw / P-parallelism
  R band build  ~ pixels * Kh
so smaller Kh (tile_h=8 -> win_r 16/24) and smaller Kw (win_k=64/tile_w=48)
now buy relatively MORE than they did when the band build dwarfed the
matmul. Re-probe all shapes on the real chip at the bench Y/UV geometry,
with parity + overflow checks.

Run: python experiments/perf_probe20.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_matrices  # noqa: E402


def sweep(tag, W, H, kchan, plane_index, cands):
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import (FIX_COLOR_RANGE, KernelConfig,
                                                KernelDynamics)

    rng = np.random.default_rng(0)
    f = (W * 0.62, W * 0.62)
    fov = 0.92
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=8, distortion_model="opencv_fisheye",
                       plane_index=plane_index, flags=FIX_COLOR_RANGE)
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2),
                              k=[0.25, -0.07, 0.02, -0.003], fov=fov,
                              max_pixel_value=1023.0, pixel_value_limit=1023.0,
                              background=(0, 0, 0, 1))
    img = jnp.asarray(rng.uniform(0, 1023, (H, W, kchan)).astype(np.float32))
    mats = jnp.asarray(make_matrices(W, H, f, fov, H))

    ref = None
    results = []
    for cand in cands:
        wh, ww, wk, tw, th, wr = cand

        def run(y, m, salt, _c=cand):
            out, ov = remap.remap_plane_pallas(
                y + salt, m, cfg, dyn, win_h=_c[0], win_w=_c[1], win_k=_c[2],
                tile_w=_c[3], tile_h=_c[4], win_r=_c[5])
            return out, ov

        run_j = jax.jit(run)
        try:
            out, ov = run_j(img, mats, jnp.float32(0.0))
            out.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"{tag} {cand}: COMPILE FAIL {str(e)[:100]}")
            continue
        if bool(ov):
            print(f"{tag} {cand}: OVERFLOW")
            continue
        if ref is None:
            ref = np.asarray(out)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out) - ref)))

        def run_sum(y, m, salt, _c=cand):
            out, ov = remap.remap_plane_pallas(
                y + salt, m, cfg, dyn, win_h=_c[0], win_w=_c[1], win_k=_c[2],
                tile_w=_c[3], tile_h=_c[4], win_r=_c[5])
            return jnp.sum(out)

        rs = jax.jit(run_sum)
        float(rs(img, mats, jnp.float32(0.0)))
        B = 12
        salts = [jnp.float32(i * 1e-6) for i in range(B)]
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [rs(img, mats, salts[i]) for i in range(B)]
            float(outs[-1])
            dt = (time.time() - t0) / B
            best = dt if best is None else min(best, dt)
        print(f"{tag} {cand}: {best*1000:6.2f} ms  maxerr={err:.4f}")
        results.append((cand, best))
    return results


def main():
    # (win_h, win_w, win_k, tile_w, tile_h, win_r)
    y_cands = [
        (40, 256, 128, 96, 16, 32),   # production r3 baseline
        (24, 256, 128, 96, 8, 16),    # th8: halve Kh
        (32, 256, 128, 96, 8, 24),
        (24, 256, 64, 48, 8, 16),     # th8 + k64: halve Kw too
        (32, 256, 64, 48, 8, 24),
        (40, 256, 64, 48, 16, 32),    # k64 at th16
        (40, 256, 128, 48, 16, 32),   # narrow tiles, full K (span slack)
        (56, 256, 128, 96, 32, 48),   # th32: fewer tiles
        (64, 256, 128, 96, 32, 56),
        (40, 256, 128, 192, 16, 32),  # wide tiles (span may overflow k128)
        (32, 256, 128, 96, 16, 24),   # tighter win_r at th16 (r3: overflowed)
    ]
    uv_cands = [
        (40, 256, 128, 96, 16, 32),
        (24, 256, 128, 96, 8, 16),
        (32, 256, 128, 96, 8, 24),
        (24, 256, 64, 48, 8, 16),
        (40, 256, 64, 48, 16, 32),
    ]
    sweep("Y 4K", 3840, 2160, 1, 0, y_cands)
    sweep("UV 1080", 1920, 1080, 2, 1, uv_cands)


if __name__ == "__main__":
    main()

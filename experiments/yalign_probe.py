"""Probe: rolled compute height win_r (round 3).

Mosaic requires 8-aligned DMA row origins (unaligned memref_slice fails to
compile), so instead of shrinking the DMA window the kernel now optionally
rolls each tile's exact row band to sublane 0 (dynamic sublane roll, the
row analogue of the existing win_k lane roll) and runs the colmix on only
win_r rows. The colmix matmul M-dim is C*rows — at the bench geometry the
Y plane needed win_h=40 aligned but only ~28 exact rows, so win_r=32 cuts
the dominant MXU cost ~20%.

This probes, on the real chip at bench geometry: overflow, parity vs the
unrolled config, and per-frame time across (win_h, win_r) combos.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_matrices
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

    ref = None
    for (wh, wr) in ((40, 0), (40, 32), (32, 24), (40, 24), (48, 40)):
        out, ov = remap.remap_plane_pallas_jit(
            img, mats, cfg, dyn, win_h=wh, win_w=256, win_k=128, tile_w=96,
            tile_h=16, win_r=wr)
        out.block_until_ready()
        if bool(ov):
            print(f"win_h={wh} win_r={wr}: OVERFLOW")
            continue
        if ref is None:
            ref = np.asarray(out)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out) - ref)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            for i in range(12):
                o, _ = remap.remap_plane_pallas_jit(
                    img, mats, cfg, dyn, win_h=wh, win_w=256, win_k=128,
                    tile_w=96, tile_h=16, win_r=wr)
            o.block_until_ready()
            ts.append((time.time() - t0) / 12)
        print(f"win_h={wh} win_r={wr}: {min(ts)*1000:.2f} ms/frame, "
              f"maxerr vs (40,0) = {err:.4f}")


if __name__ == "__main__":
    main()

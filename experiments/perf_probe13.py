"""Probe 13: tile_h scaling on the rolled-window path at 4K Y.

Bench config: tile_h=16, win_h=24, win_k=128, tile_w=96 (62.4 fps).
Candidates: tile_h 8 (old manager default), 32 with win_h 48 — fewer tiles
amortize per-tile one-hot builds, DMAs and matmul fills.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe13.py
"""
import json

import numpy as np

from perf_probe import make_matrices, timed


def main():
    import jax
    import jax.numpy as jnp
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    rng = np.random.default_rng(0)
    results = {}

    W, H = 3840, 2160
    f = (W * 0.62, W * 0.62)
    fov = 0.92
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=8, distortion_model="opencv_fisheye",
                       plane_index=0, flags=FIX_COLOR_RANGE)
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2), k=[0.25, -0.07, 0.02, -0.003],
                              fov=fov, max_pixel_value=1023.0,
                              pixel_value_limit=1023.0, background=(0, 0, 0, 1))
    img = jnp.asarray(rng.uniform(0, 1023, (H, W, 1)).astype(np.float32))
    mats = jnp.asarray(make_matrices(W, H, f, fov, H))

    for (th, wh, wk, tw, ww) in ((8, 24, 128, 96, 256),
                                 (16, 24, 128, 96, 256),
                                 (16, 32, 128, 96, 256),
                                 (32, 40, 128, 96, 256),
                                 (32, 48, 128, 96, 256),
                                 (16, 32, 0, 128, 384),
                                 (32, 48, 0, 128, 512)):
        @jax.jit
        def full(img, mats, salt, th=th, wh=wh, wk=wk, tw=tw, ww=ww):
            out, ov = remap.remap_plane_pallas(
                img + salt, mats, cfg, dyn, win_h=wh, win_w=ww, win_k=wk,
                tile_h=th, tile_w=tw)
            return jnp.sum(out) + 0.0 * jnp.float32(ov)

        key = f"th{th}_wh{wh}_k{wk}_tw{tw}"
        try:
            _, ov = remap.remap_plane_pallas_jit(
                img, mats, cfg, dyn, win_h=wh, win_w=ww, win_k=wk,
                tile_h=th, tile_w=tw)
            if bool(ov):
                results[key] = "overflow"
                print(key, "overflow", flush=True)
                continue
            results[key] = round(timed(full, img, mats), 3)
            print(key, results[key], flush=True)
        except Exception as e:
            results[key] = f"err: {str(e)[:120]}"
            print(key, results[key], flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

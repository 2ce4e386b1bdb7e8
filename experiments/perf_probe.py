"""Per-stage perf probe on the real TPU: coords vs sampler, tile_h scaling.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe.py [stage]
Timing method per tpu-axon-quirks: queue B dispatches of a scalar-returning
jitted fn, then float(last) — in-order device queue, amortizes the ~30 ms
tunnel dispatch floor.
"""
import json
import math
import sys
import time

import numpy as np


def make_matrices(W, H, f, fov, n_rows):
    def rotm(rx, ry, rz):
        cx, sx, cy, sy, cz, sz = (math.cos(rx), math.sin(rx), math.cos(ry),
                                  math.sin(ry), math.cos(rz), math.sin(rz))
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return Rz @ Ry @ Rx
    new_k = np.array([[f[0] / fov, 0, W / 2], [0, f[1] / fov, H / 2], [0, 0, 1.0]])
    rows = []
    for i in range(n_rows):
        r = rotm(0.012 + 1.5e-5 * i, -0.018, 0.006)
        r[0, 1] *= -1; r[0, 2] *= -1; r[1, 0] *= -1; r[2, 0] *= -1
        rows.append(list(np.linalg.pinv(new_k @ r).flatten()) + [0.0] * 5)
    return np.asarray(rows, np.float32)


def timed(fn, *args, B=24, reps=3):
    import jax.numpy as jnp
    v = float(fn(*args, jnp.float32(0.0)))
    assert math.isfinite(v), v
    best = None
    for _ in range(reps):
        t0 = time.time()
        outs = [fn(*args, jnp.float32(i * 1e-6)) for i in range(B)]
        float(outs[-1])
        dt = (time.time() - t0) / B
        best = dt if best is None else min(best, dt)
    return best * 1000.0  # ms


def main():
    import jax
    import jax.numpy as jnp
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    rng = np.random.default_rng(0)
    planes = {}
    for name, (W, H, plane_index, kchan) in {
            "Y": (3840, 2160, 0, 1), "UV": (1920, 1080, 1, 2)}.items():
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
        planes[name] = (cfg, dyn, img, mats)

    results = {}

    # -- full per-plane remap across tile_h and windows ----------------------
    for name, (cfg, dyn, img, mats) in planes.items():
        for tile_h in (8, 16, 32):
            for win in ((32, 256), (40, 256), (48, 256), (56, 256), (64, 256),
                        (72, 384), (96, 384)):
                if win[0] < tile_h + 10:
                    continue
                key = f"{name} t{tile_h} w{win[0]}x{win[1]}"
                try:
                    out, ov = remap.remap_plane_pallas_jit(
                        img, mats, cfg, dyn, None, win_h=win[0], win_w=win[1],
                        tile_h=tile_h)
                    if bool(ov):
                        results[key] = "overflow"
                        continue

                    @jax.jit
                    def run(img, mats, salt, _w=win, _t=tile_h, _c=cfg, _d=dyn):
                        o, _ = remap.remap_plane_pallas(img + salt, mats, _c, _d,
                                                        win_h=_w[0], win_w=_w[1],
                                                        tile_h=_t)
                        return jnp.sum(o) + salt
                    ms = timed(run, img, mats)
                    results[key] = round(ms, 3)
                    print(key, "->", results[key], flush=True)
                except Exception as e:
                    results[key] = f"ERR {str(e)[:120]}"
                    print(key, "->", results[key], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

"""Probe: per-frame dispatch vs F-frame windowed dispatch on the real chip.

STATUS.md r3 profile: device-side full frame step is 14.44 ms (69.3 fps) but
bench.py reads ~63.6 fps — the delta is per-call host dispatch through the
axon tunnel. The production render path now batches F frames per dispatch
(renderer frame_window, single-device allowed). This probe measures whether
routing the bench geometry through `stabilize_window_production`-style
windowed steps recovers the dispatch overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/window_dispatch_probe.py
"""
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


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


def main():
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics
    from gyroflow_tpu.parallel import pipeline

    rng = np.random.default_rng(0)
    planes = []
    for (W, H, plane_index, kchan) in ((3840, 2160, 0, 1), (1920, 1080, 1, 2)):
        f = (W * 0.62, W * 0.62)
        fov = 0.92
        cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                           interpolation=8, distortion_model="opencv_fisheye",
                           plane_index=plane_index, flags=FIX_COLOR_RANGE)
        dyn = KernelDynamics.make(
            f=f, c=(W / 2, H / 2), k=[0.25, -0.07, 0.02, -0.003], fov=fov,
            max_pixel_value=1023.0, pixel_value_limit=1023.0,
            background=(0, 0, 0, 1))
        img = jnp.asarray(rng.uniform(0, 1023, (H, W, kchan)).astype(np.float32))
        mats = jnp.asarray(make_matrices(W, H, f, fov, H))
        planes.append((cfg, dyn, img, mats))

    WIN_Y = (40, 256, 128, 96, 16, 32)   # (win_h, win_w, win_k, tile_w, tile_h, win_r)
    WIN_UV = (40, 256, 128, 96, 16, 32)

    # ---- per-frame dispatch baseline (same as bench.py) ----
    @jax.jit
    def run_frame(y, yl, uv, uvm, salt):
        cfg0, dyn0 = planes[0][0], planes[0][1]
        cfg1, dyn1 = planes[1][0], planes[1][1]
        oy, _ = remap.remap_plane_pallas(y + salt, yl, cfg0, dyn0,
                                         win_h=WIN_Y[0], win_w=WIN_Y[1],
                                         win_k=WIN_Y[2], tile_w=WIN_Y[3],
                                         tile_h=WIN_Y[4], win_r=WIN_Y[5])
        ouv, _ = remap.remap_plane_pallas(uv + salt, uvm, cfg1, dyn1,
                                          win_h=WIN_UV[0], win_w=WIN_UV[1],
                                          win_k=WIN_UV[2], tile_w=WIN_UV[3],
                                          tile_h=WIN_UV[4], win_r=WIN_UV[5])
        return jnp.sum(oy) + jnp.sum(ouv) + salt

    y_img, y_mats = planes[0][2], planes[0][3]
    uv_img, uv_mats = planes[1][2], planes[1][3]
    v = float(run_frame(y_img, y_mats, uv_img, uv_mats, jnp.float32(0.0)))
    assert math.isfinite(v)
    B = 24
    salts = [jnp.float32(i * 1e-6) for i in range(B)]
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [run_frame(y_img, y_mats, uv_img, uv_mats, salts[i]) for i in range(B)]
        float(outs[-1])
        dt = (time.time() - t0) / B
        best = dt if best is None else min(best, dt)
    print(f"per-frame dispatch: {best*1e3:.2f} ms/frame = {1/best:.2f} fps")

    # ---- windowed dispatch: F frames per jit call, both planes in one call ----
    for F in (4, 8):
        cfg0, dyn0 = planes[0][0], planes[0][1]
        cfg1, dyn1 = planes[1][0], planes[1][1]

        @jax.jit
        def run_window(ys, ymats, uvs, uvmats, salt):
            oy_sum = jnp.float32(0.0)
            for i in range(F):
                oy, _ = remap.remap_plane_pallas(
                    ys[i] + salt, ymats[i], cfg0, dyn0,
                    win_h=WIN_Y[0], win_w=WIN_Y[1], win_k=WIN_Y[2],
                    tile_w=WIN_Y[3], tile_h=WIN_Y[4], win_r=WIN_Y[5])
                ouv, _ = remap.remap_plane_pallas(
                    uvs[i] + salt, uvmats[i], cfg1, dyn1,
                    win_h=WIN_UV[0], win_w=WIN_UV[1], win_k=WIN_UV[2],
                    tile_w=WIN_UV[3], tile_h=WIN_UV[4], win_r=WIN_UV[5])
                oy_sum = oy_sum + jnp.sum(oy) + jnp.sum(ouv)
            return oy_sum + salt

        ys = jnp.stack([y_img] * F)
        ymats = jnp.stack([y_mats] * F)
        uvs = jnp.stack([uv_img] * F)
        uvmats = jnp.stack([uv_mats] * F)
        v = float(run_window(ys, ymats, uvs, uvmats, jnp.float32(0.0)))
        assert math.isfinite(v)
        nwin = max(24 // F, 2)
        salts = [jnp.float32(i * 1e-6) for i in range(nwin)]
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [run_window(ys, ymats, uvs, uvmats, salts[i]) for i in range(nwin)]
            float(outs[-1])
            dt = (time.time() - t0) / (nwin * F)
            best = dt if best is None else min(best, dt)
        print(f"windowed F={F} dispatch: {best*1e3:.2f} ms/frame = {1/best:.2f} fps")


if __name__ == "__main__":
    main()

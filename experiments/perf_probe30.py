"""Probe 30 (round 5): EWA jacobian row-crossing stats + same-row variant.

Probe 29 showed 4K EWA lands the cap-4 rung (51.4 ms) because ~1% of pixels'
finite-difference jacobian crosses an RS matrix-row boundary (the re-probed
rint(pv) flips), amplifying the row-to-row matrix delta by 1/eps = 100x.
Forced cap-2/2 runs 32.15 ms (31.1 fps) but is escalated by exactly those
pixels. This probe measures, on the bench 4K fisheye+RS content:
  1. the fraction of pixels whose +eps x / +eps y eval selects a different
     matrix row than the base eval;
  2. need_x / need_y percentiles (p99/p999/max) for
     (a) the reference jacobian (re-probed row select, cpu_undistort.rs
         semantics) and
     (b) a same-row jacobian (+-eps evals reuse the base eval's row).
If (b)'s max need fits cap 2-3, the same-row mode unlocks the fast rungs.

Run: python experiments/perf_probe30.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_matrices  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import (FIX_COLOR_RANGE, KernelConfig,
                                                KernelDynamics)
    from gyroflow_tpu.ops.remap import (coords_pre, coords_post_uv,
                                        rotate_and_distort, ewa_coeffs)

    W, H = 3840, 2160
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
    mats = jnp.asarray(make_matrices(W, H, f, 0.92, H))

    factor = max(1.0 - float(dyn.lens_correction_amount), 0.001)
    out_c = (cfg.output_width / 2.0, cfg.output_height / 2.0)
    out_f = (float(dyn.f[0]) / float(dyn.fov) / factor,
             float(dyn.f[1]) / float(dyn.fov) / factor)

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    out_pos = jnp.stack([xx, yy], axis=-1)

    eps = 0.01

    @jax.jit
    def stats():
        x0, y0, idx0, _ = coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
        uv0, v0ok = rotate_and_distort(jnp.stack([x0, y0], axis=-1), idx0,
                                       mats, cfg, dyn)
        u0, v0 = coords_post_uv(uv0[..., 0], uv0[..., 1], cfg)
        uv = jnp.stack([u0, v0], axis=-1)

        res = {}
        for name, same_row in (("ref", False), ("same", True)):
            evs = []
            for off in ((eps, 0.0), (0.0, eps)):
                op = out_pos + jnp.asarray(off, jnp.float32)
                xe, ye, idxe, _ = coords_pre(op, mats, cfg, dyn, out_c, out_f)
                if same_row:
                    idxe = idx0
                uve, vok = rotate_and_distort(jnp.stack([xe, ye], axis=-1),
                                              idxe, mats, cfg, dyn)
                ue, ve = coords_post_uv(uve[..., 0], uve[..., 1], cfg)
                evs.append((jnp.stack([ue, ve], axis=-1), vok, idxe))
            (uv_x, vx, idx_x), (uv_y, vy, idx_y) = evs
            dx = jnp.where(vx[..., None], uv_x, 0.0) - uv
            dy = jnp.where(vy[..., None], uv_y, 0.0) - uv
            jx, jy = dx[..., 0] / eps, dy[..., 0] / eps
            jz, jw = dx[..., 1] / eps, dy[..., 1] / eps
            tx_m = 2.0 * jnp.maximum(jnp.maximum(jnp.abs(jx + jy),
                                                 jnp.abs(jx - jy)), 1.0)
            ty_m = 2.0 * jnp.maximum(jnp.maximum(jnp.abs(jz + jw),
                                                 jnp.abs(jz - jw)), 1.0)
            # dr<=4 ellipse support extents (mirrors remap.py's cap check)
            f0 = jnp.abs(jx * jw - jy * jz)
            fq = jnp.maximum(f0 * f0, 0.1)
            a_e = (jz * jz + jw * jw) / fq
            b_e = -2.0 * (jx * jz + jy * jw) / fq
            c_e = (jx * jx + jy * jy) / fq
            vx_e, vy_e = c_e - a_e, -b_e
            lv = jnp.sqrt(vx_e * vx_e + vy_e * vy_e)
            v0_e = jnp.where(lv > 0.01, vx_e / jnp.where(lv == 0, 1.0, lv), 1.0)
            ccx = jnp.sqrt(jnp.maximum(1.0 + v0_e, 0.0) / 2.0)
            s_ = jnp.sqrt(jnp.maximum(1.0 - v0_e, 0.0) / 2.0)
            a0 = a_e * ccx * ccx - b_e * ccx * s_ + c_e * s_ * s_
            c0 = a_e * s_ * s_ + b_e * ccx * s_ + c_e * ccx * ccx
            bt1 = b_e * (ccx * ccx - s_ * s_)
            bt2 = 2.0 * (a_e - c_e) * ccx * s_
            b0 = bt1 + bt2
            b0v2 = bt1 - bt2
            flip = jnp.abs(b0) > jnp.abs(b0v2)
            s_ = jnp.where(flip, -s_, s_)
            b0 = jnp.where(flip, b0v2, b0)
            a0 = jnp.minimum(a0, 1.0)
            c0 = jnp.minimum(c0, 1.0)
            sn = -s_
            abc_x = a0 * ccx * ccx - b0 * ccx * sn + c0 * sn * sn
            abc_z = a0 * sn * sn + b0 * ccx * sn + c0 * ccx * ccx
            abc_y = (2.0 * a0 * ccx * sn + b0 * ccx * ccx - b0 * sn * sn
                     - 2.0 * c0 * ccx * sn)
            det = abc_x * abc_z - 0.25 * abc_y * abc_y
            good = det > 1e-9
            sx_m = jnp.where(good, 2.0 * jnp.sqrt(jnp.maximum(abc_z, 0.0)
                                                  / jnp.maximum(det, 1e-9)), 1e9)
            sy_m = jnp.where(good, 2.0 * jnp.sqrt(jnp.maximum(abc_x, 0.0)
                                                  / jnp.maximum(det, 1e-9)), 1e9)
            need_x = jnp.where(v0ok, jnp.minimum(tx_m, sx_m), 0.0)
            need_y = jnp.where(v0ok, jnp.minimum(ty_m, sy_m), 0.0)
            res[name] = (need_x, need_y,
                         jnp.mean((idx_x != idx0).astype(jnp.float32)),
                         jnp.mean((idx_y != idx0).astype(jnp.float32)))
        return res

    res = jax.device_get(stats())
    for name in ("ref", "same"):
        nx, ny, cross_x, cross_y = res[name]
        nx, ny = np.asarray(nx).ravel(), np.asarray(ny).ravel()
        print(f"[{name}] row-cross frac: x-eval {float(cross_x)*100:.3f}% "
              f"y-eval {float(cross_y)*100:.3f}%")
        for lbl, a in (("need_x", nx), ("need_y", ny)):
            q = np.percentile(a, [99, 99.9, 99.99, 100])
            print(f"[{name}] {lbl}: p99={q[0]:.3f} p99.9={q[1]:.3f} "
                  f"p99.99={q[2]:.3f} max={q[3]:.3f} "
                  f">2: {float((a > 2).mean())*100:.4f}% "
                  f">3: {float((a > 3).mean())*100:.4f}%")


if __name__ == "__main__":
    main()

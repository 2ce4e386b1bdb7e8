"""The fused per-pixel undistort/rotate/redistort remap — TPU compute path.

This is the JAX/XLA implementation of the reference's single-source pixel kernel
(semantics: stabilize_spirv/src/stabilize.rs:58-141 == cpu_undistort.rs:421-625 ==
opencl_undistort.cl/wgpu_undistort.wgsl; see SURVEY.md §8.1 for the verified
step list). One traced program per KernelConfig replaces the reference's three
shader dialects + CPU fallback; whole frames are computed as one fused XLA
program (coordinate math on the VPU, N-tap gathers for sampling).

Every step below cites the reference source it mirrors. All math f32.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import distortion_models as dm


def _init_compilation_cache():
    """Persist compiled kernels across CLI invocations — the first frame of
    a fresh process otherwise pays the full XLA/Mosaic compile (~80 s for the
    4K pipeline). Disable with GYROFLOW_TPU_NO_CACHE=1."""
    import os
    if os.environ.get("GYROFLOW_TPU_NO_CACHE"):
        return
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # CPU AOT artifacts are host-feature specific (replaying them across
        # machines risks SIGILL); the cache only pays off for TPU compiles
        return
    try:
        cache = os.environ.get(
            "GYROFLOW_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "gyroflow_tpu", "jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization; never fail import over it
        pass


_init_compilation_cache()
from .interpolation import COEFFS, INTER_BITS, INTER_TAB_SIZE, INTERP_INFO
from .kernel_params import (
    ANY_UNDERWATER, DRAWING_ENABLED, FILL_WITH_BACKGROUND, FIX_COLOR_RANGE,
    FRAMEBUFFER_INVERTED, HAS_DIGITAL_LENS, HAS_FPD_DATA, HAS_IBIS_DATA,
    HAS_MESH_DATA, HORIZONTAL_RS, KernelConfig, KernelDynamics,
)

_COEFFS_J = jnp.asarray(COEFFS)


def map_coord(x, in_min, in_max, out_min, out_max):
    """Linear range remap (util.rs:144-147)."""
    return (x - in_min) * (out_max - out_min) / (in_max - in_min) + out_min


def _lens_params(cfg: KernelConfig, dyn: KernelDynamics) -> dm.LensParams:
    return dm.LensParams(
        k=dyn.k, digital_lens_params=dyn.digital_lens_params,
        width=jnp.float32(cfg.width), height=jnp.float32(cfg.height),
        output_width=jnp.float32(cfg.output_width), output_height=jnp.float32(cfg.output_height),
    )


def _forward_refraction(x, y, w, lrc):
    """Underwater forward refraction scaling of w (cpu_undistort.rs:143-152)."""
    do = (lrc != 1.0) & (lrc > 0.0) & (w != 0.0)
    w_safe = jnp.where(w == 0.0, 1.0, w)
    r = jnp.sqrt(x * x + y * y) / w_safe
    sin_theta_d = (r / jnp.sqrt(1.0 + r * r)) * lrc
    denom = jnp.sqrt(jnp.maximum(1.0 - sin_theta_d * sin_theta_d, 1e-12))
    r_d = sin_theta_d / denom
    scale = jnp.where((r_d != 0.0) & do, r / jnp.where(r_d == 0.0, 1.0, r_d), 1.0)
    return w * scale


def _inverse_refraction(pt, lrc):
    """Inverse refraction applied after radial undistort (cpu_undistort.rs:448-456)."""
    do = (lrc != 1.0) & (lrc > 0.0)
    r = jnp.sqrt(jnp.sum(pt * pt, axis=-1))
    nz = r != 0.0
    r_safe = jnp.where(nz, r, 1.0)
    sin_theta_d = (r_safe / jnp.sqrt(1.0 + r_safe * r_safe)) / lrc
    denom = jnp.sqrt(jnp.maximum(1.0 - sin_theta_d * sin_theta_d, 1e-12))
    r_d = sin_theta_d / denom
    factor = jnp.where(do & nz, r_d / r_safe, 1.0)
    return pt * factor[..., None]


def rotate_and_distort_core(px, py, m, cfg: KernelConfig, dyn: KernelDynamics,
                            lp: dm.LensParams, mesh=None):
    """Shared tuple-based core of rotate_and_distort.

    ``m`` is a length-14 sequence of broadcastable arrays/scalars (matrix row
    elements) — from a per-pixel XLA gather, or from a one-hot matmul inside
    the Pallas coords kernel. Returns (u, v, valid). Pallas-safe (2D only).
    """
    model = dm.get_model(cfg.distortion_model)
    digital = dm.get_model(cfg.digital_lens) if cfg.digital_lens else None

    _x = px * m[0] + py * m[1] + m[2] + dyn.translation3d[0]
    _y = px * m[3] + py * m[4] + m[5] + dyn.translation3d[1]
    _w = px * m[6] + py * m[7] + m[8] + dyn.translation3d[2]

    valid = _w > 0.0
    r_limit_sq = dyn.r_limit * dyn.r_limit
    valid = valid & ~((r_limit_sq > 0.0) & ((_x * _x + _y * _y) > r_limit_sq * _w))

    if cfg.has(ANY_UNDERWATER):
        _w = _forward_refraction(_x, _y, _w, dyn.light_refraction_coefficient)

    w_safe = jnp.where(valid, _w, 1.0)
    u, v = model.distort_xy(_x, _y, w_safe, lp)
    u = u * dyn.f[0]
    v = v * dyn.f[1]

    # IBIS/OIS shift + rotation from matrix cols 9-13 (cpu_undistort.rs:157-165)
    if cfg.has(HAS_IBIS_DATA):
        any_is = (m[9] != 0.0) | (m[10] != 0.0) | (m[11] != 0.0) | \
                 (m[12] != 0.0) | (m[13] != 0.0)
        ang = m[11]
        cos_a = jnp.cos(-ang)
        sin_a = jnp.sin(-ang)
        u2 = cos_a * u - sin_a * v - m[9] + m[12]
        v2 = sin_a * u + cos_a * v - m[10] + m[13]
        u = jnp.where(any_is, u2, u)
        v = jnp.where(any_is, v2, v)

    u = u + dyn.c[0]
    v = v + dyn.c[1]

    if cfg.has(HAS_MESH_DATA):
        from .mesh import apply_mesh_correction
        u, v = apply_mesh_correction(u, v, mesh, cfg)
    if cfg.has(HAS_FPD_DATA):
        from .mesh import apply_focal_plane_distortion
        gw, gh = cfg.mesh_grid
        fpd_offset = 9 + gw * gh * 2 + 2 * gh * 36
        u, v = apply_focal_plane_distortion(u, v, mesh, fpd_offset, cfg)

    if cfg.has(HAS_DIGITAL_LENS) and digital is not None:
        u, v = digital.distort_xy(u, v, jnp.ones_like(u), lp)

    sh = dyn.input_horizontal_stretch
    sv = dyn.input_vertical_stretch
    u = jnp.where(sh > 0.001, u / jnp.where(sh > 0.001, sh, 1.0), u)
    v = jnp.where(sv > 0.001, v / jnp.where(sv > 0.001, sv, 1.0), v)
    return u, v, valid


def rotate_and_distort(pos, idx, matrices, cfg: KernelConfig, dyn: KernelDynamics,
                       mesh=None):
    """Project output-space point(s) through row matrix idx into source uv.

    Mirrors Stabilization::rotate_and_distort (cpu_undistort.rs:133-228).
    Returns (uv (...,2), valid (...,)). XLA path (per-pixel matrix gather).
    """
    lp = _lens_params(cfg, dyn)
    if matrices.shape[0] == 1:
        m = [matrices[0, i] for i in range(14)]  # broadcast, no gather
    else:
        mg = jnp.take(matrices, idx, axis=0)  # (...,14)
        m = [mg[..., i] for i in range(14)]
    u, v, valid = rotate_and_distort_core(pos[..., 0], pos[..., 1], m, cfg, dyn, lp,
                                          mesh=mesh)
    return jnp.stack([u, v], axis=-1), valid


def _rotate_point(px, py, angle, origin, origin2):
    """cpu_undistort.rs:262-265."""
    ca, sa = math.cos(angle), math.sin(angle)
    return (ca * (px - origin[0]) - sa * (py - origin[1]) + origin2[0],
            sa * (px - origin[0]) + ca * (py - origin[1]) + origin2[1])


def _rotated_frame_size(cfg: KernelConfig) -> Tuple[float, float]:
    rotation = cfg.input_rotation * (math.pi / 180.0)
    fx, fy = _rotate_point(float(cfg.width), float(cfg.height), rotation, (0.0, 0.0), (0.0, 0.0))
    return (round(abs(fx)), round(abs(fy)))


def coords_pre(out_pos, matrices, cfg: KernelConfig, dyn: KernelDynamics,
               out_c, out_f, mesh=None, rs_idx=None):
    """Stages of undistort_coord BEFORE the per-pixel matrix projection:
    output-rect map, translation2d, lens-correction blend, RS row select.
    Returns (x, y, idx).

    `rs_idx` overrides the rolling-shutter row select (the probe projection
    is skipped entirely): the EWA same-row jacobian mode evaluates the ±eps
    finite differences with the BASE pixel's matrix row (KernelConfig.
    ewa_ref_jac docstring)."""
    model = dm.get_model(cfg.distortion_model)
    digital = dm.get_model(cfg.digital_lens) if cfg.digital_lens else None
    lp = _lens_params(cfg, dyn)
    orx, ory, orw, orh = cfg.out_rect

    x = map_coord(out_pos[..., 0], float(orx), float(orx + orw), 0.0, float(cfg.output_width))
    y = map_coord(out_pos[..., 1], float(ory), float(ory + orh), 0.0, float(cfg.output_height))
    x = x + dyn.translation2d[0]
    y = y + dyn.translation2d[1]

    # ---- lens correction blend (cpu_undistort.rs:429-460) ----
    if cfg.lens_correction:
        nx, ny = x, y
        if cfg.has(HAS_DIGITAL_LENS) and digital is not None:
            # digital warp FOV-independently: un-zoom -> warp -> re-zoom
            uzx = (nx - out_c[0]) * dyn.fov + out_c[0]
            uzy = (ny - out_c[1]) * dyn.fov + out_c[1]
            dpt, dvalid = digital.undistort(jnp.stack([uzx, uzy], axis=-1), lp)
            nx = jnp.where(dvalid, (dpt[..., 0] - out_c[0]) / dyn.fov + out_c[0], nx)
            ny = jnp.where(dvalid, (dpt[..., 1] - out_c[1]) / dyn.fov + out_c[1], ny)
        nx = (nx - out_c[0]) / out_f[0]
        ny = (ny - out_c[1]) / out_f[1]
        upt, uvalid = model.undistort(jnp.stack([nx, ny], axis=-1), lp)
        nx = jnp.where(uvalid, upt[..., 0], nx)
        ny = jnp.where(uvalid, upt[..., 1], ny)
        if cfg.has(ANY_UNDERWATER):
            npt = _inverse_refraction(jnp.stack([nx, ny], axis=-1), dyn.light_refraction_coefficient)
            nx, ny = npt[..., 0], npt[..., 1]
        nx = nx * out_f[0] + out_c[0]
        ny = ny * out_f[1] + out_c[1]
        amount = dyn.lens_correction_amount
        x = nx * (1.0 - amount) + x * amount
        y = ny * (1.0 - amount) + y * amount

    # ---- rolling shutter row select (cpu_undistort.rs:463-482) ----
    matrix_count = matrices.shape[0]
    if rs_idx is not None:
        return x, y, rs_idx, None
    horizontal_rs = cfg.has(HORIZONTAL_RS)
    lim = cfg.width if horizontal_rs else cfg.height
    axis = x if horizontal_rs else y
    sy = jnp.clip(jnp.rint(axis).astype(jnp.int32), 0, lim)
    probe = None
    if matrix_count > 1:
        center = matrix_count // 2
        # the probe uses ONE matrix for every pixel — broadcast it instead of
        # a per-pixel gather (a constant-index take cost ~25 ms/frame at 4K)
        mc = [matrices[center, i] for i in range(14)]
        pu, pv, probe_valid = rotate_and_distort_core(
            x, y, mc, cfg, dyn, _lens_params(cfg, dyn), mesh=mesh)
        probe_axis = pu if horizontal_rs else pv
        sy_probe = jnp.clip(jnp.rint(probe_axis).astype(jnp.int32), 0, lim)
        sy = jnp.where(probe_valid, sy_probe, sy)
        probe = (pu, pv, probe_valid)
    idx = jnp.minimum(sy, matrix_count - 1)
    return x, y, idx, probe


def coords_post_uv(u, v, cfg: KernelConfig):
    """Stages AFTER the matrix projection: input rotation, edge background
    modes, source-rect mapping (cpu_undistort.rs:485-516). Tuple form —
    elementwise and Pallas-safe."""
    # ---- input rotation (cpu_undistort.rs:485-491) ----
    frame_w, frame_h = float(cfg.width), float(cfg.height)
    if cfg.input_rotation != 0.0:
        rotation = cfg.input_rotation * (math.pi / 180.0)
        fw, fh = _rotated_frame_size(cfg)
        u, v = _rotate_point(u, v, rotation, (frame_w / 2.0, frame_h / 2.0), (fw / 2.0, fh / 2.0))
        frame_w, frame_h = fw, fh

    # ---- background edge modes (cpu_undistort.rs:493-509) ----
    if cfg.background_mode == 1:  # repeat (clamp 3px inside, matching CPU ref)
        u = jnp.clip(u, 3.0, frame_w - 3.0)
        v = jnp.clip(v, 3.0, frame_h - 3.0)
    elif cfg.background_mode == 2:  # mirror
        rx = jnp.rint(u)
        ry = jnp.rint(v)
        w3 = frame_w - 3.0
        h3 = frame_h - 3.0
        u = jnp.where(rx > w3, w3 - (rx - w3), u)
        u = jnp.where(rx < 3.0, 3.0 + frame_w - (w3 + rx), u)
        v = jnp.where(ry > h3, h3 - (ry - h3), v)
        v = jnp.where(ry < 3.0, 3.0 + frame_h - (h3 + ry), v)

    if cfg.background_mode != 3:
        sx, sy_, sw, sh = cfg.src_rect
        u = map_coord(u, 0.0, frame_w, float(sx), float(sx + sw))
        v = map_coord(v, 0.0, frame_h, float(sy_), float(sy_ + sh))

    return u, v


def coords_post(u, v, valid, cfg: KernelConfig):
    u, v = coords_post_uv(u, v, cfg)
    return jnp.stack([u, v], axis=-1), valid


def undistort_coord(out_pos, matrices, cfg: KernelConfig, dyn: KernelDynamics,
                    out_c, out_f, mesh=None, rs_idx=None):
    """Output pixel -> source uv, before background-mode / sampling.

    Mirrors undistort_coord (cpu_undistort.rs:421-517). Returns (uv, valid);
    where invalid the caller paints background. `rs_idx` overrides the RS
    row select (EWA same-row jacobian mode, see coords_pre).
    """
    x, y, idx, _probe = coords_pre(out_pos, matrices, cfg, dyn, out_c, out_f,
                                   mesh=mesh, rs_idx=rs_idx)
    uv, valid = rotate_and_distort(jnp.stack([x, y], axis=-1), idx, matrices, cfg, dyn,
                                   mesh=mesh)
    return coords_post(uv[..., 0], uv[..., 1], valid, cfg)


def sample_input(img, uv, bg, cfg: KernelConfig, dyn: KernelDynamics):
    """N-tap LUT-based separable sampling (cpu_undistort.rs:370-418).

    img: (H, W, C) f32; uv: (...,2); bg: (C,). Out-of-source-rect taps read bg.
    """
    info = INTERP_INFO[cfg.interpolation]
    taps, ind, shift, offset = info["taps"], info["ind"], info["shift"], info["offset"]
    H, W, C = img.shape
    flat = img.reshape(H * W, C)
    srx, sry, srw, srh = cfg.src_rect

    u = uv[..., 0] - offset
    v = uv[..., 1] - offset
    # guard non-finite coords (invalid lanes are masked by the caller)
    u = jnp.where(jnp.isfinite(u), u, 0.0)
    v = jnp.where(jnp.isfinite(v), v, 0.0)
    u = jnp.clip(u, -32768.0, 32768.0)
    v = jnp.clip(v, -32768.0, 32768.0)

    sx0 = jnp.rint(u * INTER_TAB_SIZE).astype(jnp.int32)
    sy0 = jnp.rint(v * INTER_TAB_SIZE).astype(jnp.int32)
    sx = sx0 >> INTER_BITS
    sy = sy0 >> INTER_BITS
    base_x = ind + ((sx0 & (INTER_TAB_SIZE - 1)) << shift)
    base_y = ind + ((sy0 & (INTER_TAB_SIZE - 1)) << shift)

    coeffs_x = jnp.take(_COEFFS_J, base_x[..., None] + jnp.arange(taps), mode="clip")  # (...,taps)
    coeffs_y = jnp.take(_COEFFS_J, base_y[..., None] + jnp.arange(taps), mode="clip")

    total = jnp.zeros(u.shape + (C,), jnp.float32)
    for yp in range(taps):
        yy = sy + yp
        row_ok = (yy >= sry) & (yy < sry + srh)
        yy_c = jnp.clip(yy, 0, H - 1)
        xsum = jnp.zeros(u.shape + (C,), jnp.float32)
        for xp in range(taps):
            xx = sx + xp
            col_ok = (xx >= srx) & (xx < srx + srw)
            xx_c = jnp.clip(xx, 0, W - 1)
            px = jnp.take(flat, yy_c * W + xx_c, axis=0, mode="clip")
            px = jnp.where((row_ok & col_ok)[..., None], px, bg)
            xsum = xsum + px * coeffs_x[..., xp, None]
        total = total + xsum * coeffs_y[..., yp, None]
    return jnp.minimum(total, dyn.pixel_value_limit)


EWA_BC = {
    10: (0.2620145, 0.3689927),   # RobidouxSharp (stabilization/mod.rs:281-285)
    11: (0.3782157, 0.3108921),   # Robidoux
    12: (0.3333333, 0.3333333),   # Mitchell
    13: (0.0, 0.5),               # CatmullRom
}
EWA_CAP = 4  # static tap-radius cap; reference bbox is 2*max(|jac|..,1) ~ 2-4


def ewa_coeffs(interpolation: int):
    """Keys cubic BC coefficients (stabilization/mod.rs:279-295)."""
    b, c = EWA_BC[interpolation]
    p = ((6.0 - 2.0 * b) / 6.0, 0.0, (-18.0 + 12.0 * b + 6.0 * c) / 6.0,
         (12.0 - 9.0 * b - 6.0 * c) / 6.0)
    q = ((8.0 * b + 24.0 * c) / 6.0, (-12.0 * b - 48.0 * c) / 6.0,
         (6.0 * b + 30.0 * c) / 6.0, (-1.0 * b - 6.0 * c) / 6.0)
    return p, q


def sample_ewa(img, uv, jac, bg, cfg: KernelConfig, dyn: KernelDynamics):
    """EWA elliptical sampling (cpu_undistort.rs:267-369), fixed-window masked.

    jac: (...,4) finite-difference Jacobian. The data-dependent bbox becomes a
    static (2*EWA_CAP+2)^2 window; taps outside the reference bbox are masked.
    """
    H, W, C = img.shape
    flat = img.reshape(H * W, C)
    srx, sry, srw, srh = cfg.src_rect
    u = jnp.clip(jnp.where(jnp.isfinite(uv[..., 0]), uv[..., 0], 0.0), -32768.0, 32768.0)
    v = jnp.clip(jnp.where(jnp.isfinite(uv[..., 1]), uv[..., 1], 0.0), -32768.0, 32768.0)
    jx, jy, jz, jw = jac[..., 0], jac[..., 1], jac[..., 2], jac[..., 3]

    # affine_bbox (cpu_undistort.rs:272-277)
    tx = 2.0 * jnp.maximum(jnp.maximum(jnp.abs(jx + jy), jnp.abs(jx - jy)), 1.0)
    ty = 2.0 * jnp.maximum(jnp.maximum(jnp.abs(jz + jw), jnp.abs(jz - jw)), 1.0)
    x0 = jnp.floor(u - tx).astype(jnp.int32)
    x1 = jnp.ceil(u + tx).astype(jnp.int32)
    y0 = jnp.floor(v - ty).astype(jnp.int32)
    y1 = jnp.ceil(v + ty).astype(jnp.int32)

    # clamped_ellipse (cpu_undistort.rs:279-314)
    f0 = jnp.abs(jx * jw - jy * jz)
    f = jnp.maximum(f0 * f0, 0.1)
    a = (jz * jz + jw * jw) / f
    b = -2.0 * (jx * jz + jy * jw) / f
    c = (jx * jx + jy * jy) / f
    vx = c - a
    vy = -b
    lv = jnp.sqrt(vx * vx + vy * vy)
    v0 = jnp.where(lv > 0.01, vx / jnp.where(lv == 0, 1.0, lv), 1.0)
    cc = jnp.sqrt(jnp.maximum(1.0 + v0, 0.0) / 2.0)
    s_ = jnp.sqrt(jnp.maximum(1.0 - v0, 0.0) / 2.0)
    a0 = a * cc * cc - b * cc * s_ + c * s_ * s_
    c0 = a * s_ * s_ + b * cc * s_ + c * cc * cc
    bt1 = b * (cc * cc - s_ * s_)
    bt2 = 2.0 * (a - c) * cc * s_
    b0 = bt1 + bt2
    b0v2 = bt1 - bt2
    flip = jnp.abs(b0) > jnp.abs(b0v2)
    s_ = jnp.where(flip, -s_, s_)
    b0 = jnp.where(flip, b0v2, b0)
    a0 = jnp.minimum(a0, 1.0)
    c0 = jnp.minimum(c0, 1.0)
    sn = -s_
    abc_x = a0 * cc * cc - b0 * cc * sn + c0 * sn * sn
    abc_y = 2.0 * a0 * cc * sn + b0 * cc * cc - b0 * sn * sn - 2.0 * c0 * cc * sn
    abc_z = a0 * sn * sn + b0 * cc * sn + c0 * cc * cc

    pw = dyn.ewa_coeffs_p
    qw = dyn.ewa_coeffs_q

    def bc2(x):
        x = jnp.abs(x)
        x2 = x * x
        pr = pw[0] + pw[1] * x + pw[2] * x2 + pw[3] * x2 * x
        qr = qw[0] + qw[1] * x + qw[2] * x2 + qw[3] * x2 * x
        return jnp.where(x < 1.0, pr, jnp.where(x < 2.0, qr, 0.0))

    base_x = jnp.floor(u).astype(jnp.int32) - EWA_CAP
    base_y = jnp.floor(v).astype(jnp.int32) - EWA_CAP
    taps = 2 * EWA_CAP + 2

    # one gather per fori_loop step instead of taps^2 unrolled gathers — the
    # unrolled form exceeded the 2 GiB TPU executable limit at 1080p
    def _tap(i, carry):
        total, sum_div = carry
        typ = i // taps
        txp = i % taps
        in_y = base_y + typ
        fy = in_y.astype(jnp.float32) - v
        fy2 = fy * abc_y
        fy3 = fy * fy * abc_z
        y_in_bbox = (in_y >= y0) & (in_y <= y1)
        yy_c = jnp.clip(in_y, 0, H - 1)
        in_x = base_x + txp
        fx = in_x.astype(jnp.float32) - u
        dr = fx * fx * abc_x + fx * fy2 + fy3
        k = bc2(jnp.sqrt(jnp.maximum(dr, 0.0)))
        k = jnp.where(y_in_bbox & (in_x >= x0) & (in_x <= x1), k, 0.0)
        in_rect = (in_y >= sry) & (in_y < sry + srh) & \
                  (in_x >= srx) & (in_x < srx + srw)
        xx_c = jnp.clip(in_x, 0, W - 1)
        px = jnp.take(flat, yy_c * W + xx_c, axis=0, mode="clip")
        px = jnp.where(in_rect[..., None], px, bg)
        return (total + k[..., None] * px, sum_div + k)

    total = jnp.zeros(u.shape + (C,), jnp.float32)
    sum_div = jnp.zeros_like(u)
    total, sum_div = jax.lax.fori_loop(0, taps * taps, _tap, (total, sum_div))
    total = total / jnp.where(sum_div == 0.0, 1.0, sum_div)[..., None]
    return jnp.minimum(total, dyn.pixel_value_limit)


def _remap_colorrange(px, is_y: bool, max_pixel_value):
    """Full->limited range (stabilize_spirv/src/drawing.rs:71-74).

    GPU-shader semantics: the offset scales with max_pixel_value (64.2 for
    10-bit planes). The reference CPU variant's flat +16 (cpu_undistort.rs:
    253-260) is an 8-bit-only simplification; the shaders are the production
    pixel truth.
    """
    px = px * (0.85882352 if is_y else 0.87843137)
    return px + (16.0 / 255.0) * max_pixel_value


def _draw_overlay(pixel, pos, canvas, scale, want_stage, cfg, dyn):
    """draw_pixel (stabilize_spirv/src/drawing.rs:20-50) for one stage.

    canvas: (hc, wc) uint8 with color<<3 | alpha<<1 | stage packing."""
    from ..core.drawing import ALPHAS, COLORS
    hc, wc = canvas.shape
    xi = jnp.floor(pos[..., 0] / scale).astype(jnp.int32)
    yi = jnp.floor(pos[..., 1] / scale).astype(jnp.int32)
    inb = (xi >= 0) & (yi >= 0) & (xi < wc) & (yi < hc)
    data = canvas[jnp.clip(yi, 0, hc - 1), jnp.clip(xi, 0, wc - 1)].astype(jnp.int32)
    color = (data & 0xF8) >> 3
    alpha = (data & 0x06) >> 1
    stage = data & 1
    active = inb & (data > 0) & (stage == want_stage) & (color < 9)
    colorf = jnp.asarray(COLORS)[jnp.clip(color, 0, 8)] * dyn.max_pixel_value  # (..., 4)
    alphaf = jnp.asarray(ALPHAS)[alpha][..., None]
    C = pixel.shape[-1]
    blended = colorf[..., :C] * alphaf + pixel * (1.0 - alphaf)
    return jnp.where(active[..., None], blended, pixel)


def _draw_safe_area(pixel, out_pos, rect):
    """draw_safe_area (stabilize_spirv/src/drawing.rs:52-69)."""
    x, y = out_pos[..., 0], out_pos[..., 1]
    rx, ry, rz, rw = [jnp.asarray(v, jnp.float32) for v in rect]
    safe = (x >= rx) & (x <= rz) & (y >= ry) & (y <= rw)
    border = (x > rx - 5.0) & (x < rz + 5.0) & (y > ry - 5.0) & (y < rw + 5.0)
    dim = jnp.where(safe, 1.0, jnp.where(border, 0.25, 0.5))
    return pixel * dim[..., None]


def remap_plane(img, matrices, cfg: KernelConfig, dyn: KernelDynamics, mesh=None,
                drawing=None):
    """Remap one plane: (H, W, C) f32 -> (output_height, output_width, C) f32.

    Mirrors undistort_image_cpu's per-pixel driver (cpu_undistort.rs:519-625),
    vectorized over the whole output grid in one fused XLA program.
    `drawing` is an optional core.drawing.DrawingState overlay, blended per
    process_final_pixel (stabilize_spirv/src/drawing.rs:78-99) when the
    DRAWING_ENABLED flag is set.
    """
    if img.dtype != jnp.float32:
        img = img.astype(jnp.float32)   # uint8 frames convert on-device
    C = img.shape[-1]
    bg_full = dyn.background * dyn.max_pixel_value  # (4,)
    bg = bg_full[:C]

    ow, oh = cfg.out_buffer
    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    out_pos = jnp.stack([gx, gy], axis=-1)  # (oh, ow, 2)

    if cfg.has(FILL_WITH_BACKGROUND):
        # note: the reference writes bg_t directly, skipping fix_range (cpu_undistort.rs:558-561)
        return jnp.broadcast_to(bg, (oh, ow, C)).astype(jnp.float32)

    factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
    out_c = (float(cfg.output_width) / 2.0, float(cfg.output_height) / 2.0)
    out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)

    uv, valid = undistort_coord(out_pos, matrices, cfg, dyn, out_c, out_f, mesh=mesh)

    jac = None
    if cfg.interpolation > 8:
        # finite-difference Jacobian, eps=0.01 (cpu_undistort.rs:566-571)
        eps = 0.01
        rs_idx = None
        if not cfg.ewa_ref_jac and matrices.shape[0] > 1:
            # same-row mode (default): the ±eps evals reuse the base pixel's
            # RS matrix row — the true within-row derivative, no 1/eps
            # row-crossing amplification (KernelConfig.ewa_ref_jac docstring)
            _, _, rs_idx, _ = coords_pre(out_pos, matrices, cfg, dyn,
                                         out_c, out_f, mesh=mesh)
        uv_x, _vx = undistort_coord(out_pos + jnp.asarray([eps, 0.0], jnp.float32),
                                    matrices, cfg, dyn, out_c, out_f, mesh=mesh,
                                    rs_idx=rs_idx)
        uv_y, _vy = undistort_coord(out_pos + jnp.asarray([0.0, eps], jnp.float32),
                                    matrices, cfg, dyn, out_c, out_f, mesh=mesh,
                                    rs_idx=rs_idx)
        dx = jnp.where(_vx[..., None], uv_x, 0.0) - uv
        dy = jnp.where(_vy[..., None], uv_y, 0.0) - uv
        jac = jnp.stack([dx[..., 0] / eps, dy[..., 0] / eps,
                         dx[..., 1] / eps, dy[..., 1] / eps], axis=-1)

    def _sample(image, uvq):
        if cfg.interpolation > 8:
            return sample_ewa(image, uvq, jac, bg, cfg, dyn)
        return sample_input(image, uvq, bg, cfg, dyn)

    if cfg.background_mode == 3:
        # margin with feather (cpu_undistort.rs:576-613)
        fw, fh = float(cfg.width), float(cfg.height)
        widthf, heightf = fw - 1.0, fh - 1.0
        feather = jnp.maximum(dyn.background_margin_feather * heightf, 0.0001)
        u, v = uv[..., 0], uv[..., 1]
        near_edge = (u > widthf - feather) | (u < feather) | (v > heightf - feather) | (v < feather)
        alpha = jnp.where(
            near_edge,
            jnp.clip(jnp.minimum(jnp.minimum(widthf - u, heightf - v), jnp.minimum(u, v)) / feather, 0.0, 1.0),
            1.0)
        pt2u = jnp.where(near_edge, ((u / fw - 0.5) * (1.0 - dyn.background_margin) + 0.5) * fw, u)
        pt2v = jnp.where(near_edge, ((v / fh - 0.5) * (1.0 - dyn.background_margin) + 0.5) * fh, v)

        frame_w, frame_h = (float(cfg.width), float(cfg.height)) if cfg.input_rotation == 0.0 \
            else _rotated_frame_size(cfg)
        srx, sry, srw, srh = cfg.src_rect
        mu = map_coord(u, 0.0, frame_w, float(srx), float(srx + srw))
        mv = map_coord(v, 0.0, frame_h, float(sry), float(sry + srh))
        m2u = map_coord(pt2u, 0.0, frame_w, float(srx), float(srx + srw))
        m2v = map_coord(pt2v, 0.0, frame_h, float(sry), float(sry + srh))

        c1 = _sample(img, jnp.stack([mu, mv], axis=-1))
        c2 = _sample(img, jnp.stack([m2u, m2v], axis=-1))
        pixel = c1 * alpha[..., None] + c2 * (1.0 - alpha[..., None])
    else:
        pixel = _sample(img, uv)

    pixel = jnp.where(valid[..., None], pixel, bg)

    # pixels whose mapped out_pos is beyond the logical output get background
    orx, ory, orw, orh = cfg.out_rect
    lx = map_coord(out_pos[..., 0], float(orx), float(orx + orw), 0.0, float(cfg.output_width))
    ly = map_coord(out_pos[..., 1], float(ory), float(ory + orh), 0.0, float(cfg.output_height))
    in_bounds = (lx >= 0.0) & (ly >= 0.0) & (lx < cfg.output_width) & (ly < cfg.output_height)
    pixel = jnp.where(in_bounds[..., None], pixel, bg)

    if cfg.has(FIX_COLOR_RANGE):
        pixel = _remap_colorrange(pixel, cfg.plane_index == 0, dyn.max_pixel_value)

    if drawing is not None and cfg.has(DRAWING_ENABLED):
        # process_final_pixel: input-stage draw gated by source_rect, then
        # output-stage draw, then safe-area dim
        canvas = jnp.asarray(drawing.canvas)
        srx, sry, srw, srh = cfg.src_rect
        src_in = (uv[..., 1] >= float(sry)) & (uv[..., 1] < float(sry + srh)) & \
                 (uv[..., 0] >= float(srx)) & (uv[..., 0] < float(srx + srw))
        drawn_in = _draw_overlay(pixel, uv, canvas, drawing.scale, 0, cfg, dyn)
        pixel = jnp.where(src_in[..., None], drawn_in, pixel)
        pixel = _draw_overlay(pixel, out_pos, canvas, drawing.scale, 1, cfg, dyn)
        if drawing.safe_area_rect is not None:
            pixel = _draw_safe_area(pixel, out_pos, drawing.safe_area_rect)
    return pixel


def _cast_out(out, out_dtype: str, dyn: KernelDynamics):
    """In-graph output cast (fused into the remap program so integer planes
    download 2-4x smaller WITHOUT a second dispatch — every extra dispatch
    costs ~1-2.5 ms of host RPC through a remote-device tunnel)."""
    if out_dtype == "uint8":
        return jnp.clip(out, 0, 255).astype(jnp.uint8)
    if out_dtype == "uint16":
        return jnp.clip(jnp.rint(out), 0, dyn.max_pixel_value).astype(jnp.uint16)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "out_dtype"))
def remap_plane_jit(img, matrices, cfg: KernelConfig, dyn: KernelDynamics, mesh=None,
                    drawing=None, out_dtype: str = "f32"):
    return _cast_out(remap_plane(img, matrices, cfg, dyn, mesh=mesh,
                                 drawing=drawing), out_dtype, dyn)


@jax.jit
def to_uint8_jit(img):
    """Device-side clip+cast so uint8 frames download 4x smaller (matches
    render.video_io.write_rgb's np.clip(...).astype(uint8))."""
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


@jax.jit
def to_uint16_jit(img, maxv):
    """Device-side rint+clip+cast so 10/16-bit planes download 2x smaller
    (matches render.renderer._ungroup_planes' np.clip(np.rint(...)))."""
    return jnp.clip(jnp.rint(img), 0, maxv).astype(jnp.uint16)


# ---------------------------------------------------------------------------
# Pallas-accelerated path: XLA computes coords (measured ~0.2ms @1080p), the
# gather-free Pallas kernel does the sampling (see pallas_sampler.py).
# ---------------------------------------------------------------------------

def remap_plane_pallas(img, matrices, cfg: KernelConfig, dyn: KernelDynamics,
                       mesh=None, win_h: int = 64, win_w: int = 512,
                       drawing=None, out_rows: int = None, oy0=0,
                       tile_h: int = 8, tile_w: int = 128, win_k: int = 0,
                       win_r: int = 0, fused: bool = False,
                       win_m: int = 0, ewa_cap: int = 4, ewa_cap_y: int = 4):
    """Drop-in replacement for remap_plane using the Pallas sampling kernels.

    Returns (output, overflow) — overflow True means some tile's source bbox
    exceeded the configured window (caller should retry with a larger window
    or fall back to remap_plane).

    The whole pipeline runs in flat-tiled (ntiles, P) layout — output pixel
    coordinates are generated arithmetically per tile, so no full-frame
    tileize/untileize transposes happen except the single final output one.

    out_rows/oy0 compute only a horizontal band of the output: `out_rows`
    rows starting at absolute output row `oy0` (which may be traced, e.g.
    `lax.axis_index` under shard_map row-sharding). All coordinate math stays
    in absolute output space; only the tile grid shrinks.
    """
    from . import pallas_sampler as ps

    # mesh/FPD only alter the coords stage; coords run in XLA (one-hot grid
    # math, gather-free) and the Pallas sampler is unchanged
    has_mesh = cfg.has(HAS_MESH_DATA) or cfg.has(HAS_FPD_DATA)
    is_ewa = cfg.interpolation > 8

    exact8 = img.dtype == jnp.uint8     # codes 0..255 are exactly bf16
    if img.dtype != jnp.float32:
        img = img.astype(jnp.float32)   # uint8 frames convert on-device
    C = img.shape[-1]
    bg_full = dyn.background * dyn.max_pixel_value
    bg = bg_full[:C]

    ow, oh = cfg.out_buffer
    oh_local = out_rows if out_rows is not None else oh
    if cfg.has(FILL_WITH_BACKGROUND):
        return jnp.broadcast_to(bg, (oh_local, ow, C)).astype(jnp.float32), jnp.asarray(False)

    spec = ps.SamplerSpec.create(
        height=img.shape[0], width=img.shape[1], out_height=oh_local, out_width=ow,
        interpolation=cfg.interpolation, tile_h=tile_h, tile_w=tile_w,
        win_h=win_h, win_w=win_w, source_rect=cfg.src_rect, win_k=win_k,
        exact8=exact8, win_r=win_r, ewa_cap=ewa_cap, ewa_cap_y=ewa_cap_y)
    P = spec.tile_h * spec.tile_w
    ox, oy, pad_ok = ps.tiled_grid(spec)            # (ntiles, P)
    oy = oy + jnp.asarray(oy0, jnp.float32)         # absolute output row
    out_pos = jnp.stack([ox, oy], axis=-1)          # (ntiles, P, 2)

    factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
    out_c = (float(cfg.output_width) / 2.0, float(cfg.output_height) / 2.0)
    out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)

    use_fused = (fused and matrices.shape[0] > 1 and not has_mesh
                 and not is_ewa and cfg.background_mode != 3
                 and not (drawing is not None and cfg.has(DRAWING_ENABLED))
                 and cfg.interpolation in (2, 4, 8))
    if use_fused:
        # Fused projection+sampling kernel (round 4): removes the coords
        # kernel's per-grid-step pipeline latency (~2.4 ms/frame Y+UV, 4K)
        # and the u/v HBM round trip. Exact in-kernel overflow feeds the
        # same ladder. See ops/pallas_fused.py.
        from . import pallas_fused as pf
        x, y, idx, probe = coords_pre(out_pos, matrices, cfg, dyn, out_c, out_f)
        imgs = jnp.moveaxis(img, -1, 0)
        pixel, overflow = pf.remap_fused(
            spec, cfg, dyn, imgs, matrices, x, y, idx, probe, pad_ok, bg,
            win_m=win_m or (64 if win_k else 256))
        orx, ory, orw, orh = cfg.out_rect
        lx = map_coord(ox, float(orx), float(orx + orw), 0.0, float(cfg.output_width))
        ly = map_coord(oy, float(ory), float(ory + orh), 0.0, float(cfg.output_height))
        in_bounds = (lx >= 0.0) & (ly >= 0.0) & (lx < cfg.output_width) & (ly < cfg.output_height)
        pixel = jnp.where(in_bounds[None], pixel, bg.reshape(C, 1, 1))
        if cfg.has(FIX_COLOR_RANGE):
            pixel = _remap_colorrange_t(pixel, cfg.plane_index == 0,
                                        dyn.max_pixel_value)
        out = jnp.moveaxis(ps.out_untileize_c(spec, pixel), 0, -1)
        return out, overflow

    coords_overflow = jnp.asarray(False)
    use_coords_kernel = matrices.shape[0] > 1 and not has_mesh

    def _kernel_coords(pos_offset=None):
        """coords_pre + per-row matrix projection (Pallas kernel) +
        coords_post; the gather-free RS coords path, also used for the EWA
        finite-difference evals (the XLA per-pixel matrix gather costs ~26
        ms/frame/eval at 4K — r4: 125 -> ~55 ms/frame 4K RS EWA).

        NEGATIVE RESULT (r4, perf_probe25, don't retry): the SELF-CONTAINED
        kernel variant (pallas_coords.project_tiles_gen — in-kernel ox/oy +
        RS probe + exact window check, coarse 6-point matrix plan) measured
        +0.06 ms/frame at the bench geometry: the saved XLA fusions
        (coords_pre 0.22 + matrix plan 0.245 + io ~0.12 ms trace) are fully
        offset by the probe's second projection chain inside the kernel —
        the chain is latency-hidden only while the kernel runs ONE of them.
        It also flips ~0.4% of pixels by one tap phase (XLA-vs-Mosaic f32
        contraction order in the probe). The classic split stays."""
        from . import pallas_coords as pc
        wm = win_m or (64 if win_k else 256)
        op = out_pos if pos_offset is None else \
            out_pos + jnp.asarray(pos_offset, jnp.float32)
        x, y, idx, _probe = coords_pre(op, matrices, cfg, dyn, out_c, out_f)
        # matrix window scales with the sampler ladder: small for the
        # rolled fast path, generous for full-width fallback configs
        u_, v_, valid_t, ov = pc.project_tiles(
            cfg, dyn, matrices, x, y, idx, win_m=wm)
        u_, v_ = coords_post_uv(u_, v_, cfg)
        return u_, v_, valid_t > 0.5, ov

    eps = 0.01
    if use_coords_kernel and is_ewa:
        # EWA RS path: the base eval and BOTH finite-difference evals ride
        # ONE projection-kernel call (tile-axis stacked). The kernel is
        # per-call latency-bound (~1.9 ms io floor per launch at 4K —
        # probe 15), so stacking amortizes two of the three launches
        # (measured 3x3.1 -> ~1x5.5 ms at 4K, perf_probe29/31). In the
        # default same-row jacobian mode the ±eps evals also skip their own
        # RS probe projections (they reuse idx0 — see ewa_ref_jac).
        from . import pallas_coords as pc
        wm = win_m or (64 if win_k else 256)
        x0, y0, idx0, _probe0 = coords_pre(out_pos, matrices, cfg, dyn,
                                           out_c, out_f)
        rs_idx = None if cfg.ewa_ref_jac else idx0
        x1, y1, idx1, _ = coords_pre(
            out_pos + jnp.asarray([eps, 0.0], jnp.float32), matrices, cfg,
            dyn, out_c, out_f, rs_idx=rs_idx)
        x2, y2, idx2, _ = coords_pre(
            out_pos + jnp.asarray([0.0, eps], jnp.float32), matrices, cfg,
            dyn, out_c, out_f, rs_idx=rs_idx)
        xs = jnp.concatenate([x0, x1, x2], axis=0)
        ys = jnp.concatenate([y0, y1, y2], axis=0)
        ids = jnp.concatenate([idx0, idx1, idx2], axis=0)
        u3, v3, valid3, coords_overflow = pc.project_tiles(
            cfg, dyn, matrices, xs, ys, ids, win_m=wm)
        u3, v3 = coords_post_uv(u3, v3, cfg)
        vt3 = valid3 > 0.5
        nt = x0.shape[0]
        u, xu, yu = u3[:nt], u3[nt:2 * nt], u3[2 * nt:]
        v, xv, yv = v3[:nt], v3[nt:2 * nt], v3[2 * nt:]
        valid, _vx, _vy = vt3[:nt], vt3[nt:2 * nt], vt3[2 * nt:]
    elif use_coords_kernel:
        # RS path: XLA coords_pre + projection kernel + sampler kernel.
        # Negative results (measured on v5e, don't retry): (a) a fully fused
        # projection+sampling mega-kernel is 2.4x SLOWER; (b) moving the RS
        # probe into the projection kernel drops 45.7 -> 41.4 fps (XLA fuses
        # the probe cheaply; in-kernel it doubles the VPU math); (c) folding
        # coords_post + sampler window planning into the projection kernel
        # drops 45.7 -> 42.8 fps (in-kernel cross-lane reductions + the meta
        # output hurt Mosaic's pipelining more than the saved XLA passes).
        u, v, valid, coords_overflow = _kernel_coords()
    else:
        # single-matrix, or mesh/FPD (XLA coords incl. one-hot mesh eval +
        # per-pixel RS matrix gather)
        uv0, valid = undistort_coord(out_pos, matrices, cfg, dyn, out_c, out_f,
                                     mesh=mesh)
        u, v = uv0[..., 0], uv0[..., 1]
    valid = valid & pad_ok

    jac = None
    if is_ewa:
        # finite-difference Jacobian, eps=0.01 (cpu_undistort.rs:566-571);
        # ewa_ref_jac=True re-runs the full chain incl. each eval's own RS
        # row select (literal reference); the default same-row mode reuses
        # the base row (KernelConfig.ewa_ref_jac docstring)
        uv = jnp.stack([u, v], axis=-1)
        if use_coords_kernel:
            uv_x = jnp.stack([xu, xv], axis=-1)
            uv_y = jnp.stack([yu, yv], axis=-1)
        else:
            rs_idx = None
            if not cfg.ewa_ref_jac and matrices.shape[0] > 1:
                _, _, rs_idx, _ = coords_pre(out_pos, matrices, cfg, dyn,
                                             out_c, out_f, mesh=mesh)
            uv_x, _vx = undistort_coord(out_pos + jnp.asarray([eps, 0.0], jnp.float32),
                                        matrices, cfg, dyn, out_c, out_f, mesh=mesh,
                                        rs_idx=rs_idx)
            uv_y, _vy = undistort_coord(out_pos + jnp.asarray([0.0, eps], jnp.float32),
                                        matrices, cfg, dyn, out_c, out_f, mesh=mesh,
                                        rs_idx=rs_idx)
        dx = jnp.where(_vx[..., None], uv_x, 0.0) - uv
        dy = jnp.where(_vy[..., None], uv_y, 0.0) - uv
        jac = jnp.stack([dx[..., 0] / eps, dy[..., 0] / eps,
                         dx[..., 1] / eps, dy[..., 1] / eps], axis=-1)
        # Cap-escalation check for sub-maximal ewa_cap rungs. A cap-c kernel
        # is EXACT iff every truncated tap is either outside the reference
        # bbox (cpu_undistort.rs:272-277 — the reference skips those too) or
        # has zero weight (bc2 zeroes dr >= 4, so taps beyond the clamped
        # ellipse's dr<=4 support never contribute). The needed radius is
        # therefore min(bbox radius, ellipse support extent); when any valid
        # pixel needs more than the rung's cap, the overflow flag escalates
        # the window ladder to the next (bigger-cap) rung. The TOP cap (4)
        # keeps the legacy fixed-stencil semantics with no check — strong
        # minification tails (fisheye periphery reaches bbox radius ~10)
        # would otherwise exhaust every rung into the XLA fallback; beyond
        # radius 4 the truncated taps sit in the bc2 tail where weights are
        # small (documented deviation, STATUS.md).
        if ewa_cap < 4 or ewa_cap_y < 4:
            jjx, jjy = jac[..., 0], jac[..., 1]
            jjz, jjw = jac[..., 2], jac[..., 3]
            cap_x = jnp.float32(ewa_cap)
            cap_y = jnp.float32(ewa_cap_y)
            tx_m = 2.0 * jnp.maximum(jnp.maximum(jnp.abs(jjx + jjy),
                                                 jnp.abs(jjx - jjy)), 1.0)
            ty_m = 2.0 * jnp.maximum(jnp.maximum(jnp.abs(jjz + jjw),
                                                 jnp.abs(jjz - jjw)), 1.0)
            # the kernel's affine_bbox, same f32 elementwise ops
            fu, fv = jnp.floor(u), jnp.floor(v)
            bbx0 = jnp.floor(u - tx_m)
            bbx1 = jnp.ceil(u + tx_m)
            bby0 = jnp.floor(v - ty_m)
            bby1 = jnp.ceil(v + ty_m)
            # mirror the kernel's clamped_ellipse abc (same f32 elementwise
            # ops on the same jac values) to get the dr<=4 support extents:
            # for dr = A fx^2 + B fx fy + C fy^2, max |fx| on dr=4 is
            # 2*sqrt(C/det), det = A*C - B^2/4
            f0 = jnp.abs(jjx * jjw - jjy * jjz)
            fq = jnp.maximum(f0 * f0, 0.1)
            a_e = (jjz * jjz + jjw * jjw) / fq
            b_e = -2.0 * (jjx * jjz + jjy * jjw) / fq
            c_e = (jjx * jjx + jjy * jjy) / fq
            vx_e = c_e - a_e
            vy_e = -b_e
            lv = jnp.sqrt(vx_e * vx_e + vy_e * vy_e)
            v0_e = jnp.where(lv > 0.01, vx_e / jnp.where(lv == 0, 1.0, lv), 1.0)
            cc = jnp.sqrt(jnp.maximum(1.0 + v0_e, 0.0) / 2.0)
            s_ = jnp.sqrt(jnp.maximum(1.0 - v0_e, 0.0) / 2.0)
            a0 = a_e * cc * cc - b_e * cc * s_ + c_e * s_ * s_
            c0 = a_e * s_ * s_ + b_e * cc * s_ + c_e * cc * cc
            bt1 = b_e * (cc * cc - s_ * s_)
            bt2 = 2.0 * (a_e - c_e) * cc * s_
            b0 = bt1 + bt2
            b0v2 = bt1 - bt2
            flip = jnp.abs(b0) > jnp.abs(b0v2)
            s_ = jnp.where(flip, -s_, s_)
            b0 = jnp.where(flip, b0v2, b0)
            a0 = jnp.minimum(a0, 1.0)
            c0 = jnp.minimum(c0, 1.0)
            sn = -s_
            abc_x = a0 * cc * cc - b0 * cc * sn + c0 * sn * sn
            abc_z = a0 * sn * sn + b0 * cc * sn + c0 * cc * cc
            abc_y = (2.0 * a0 * cc * sn + b0 * cc * cc - b0 * sn * sn
                     - 2.0 * c0 * cc * sn)
            det = abc_x * abc_z - 0.25 * abc_y * abc_y
            good = det > 1e-9
            # support epsilon: the kernel clamps a0/c0 to <= 1, which puts
            # the support at >= 2 + O(b^2) even for pure magnification — a
            # strict check would never accept cap 2. Shrinking the support
            # branch by eps accepts taps whose dr >= 4 - 4*eps, i.e. weight
            # <= |q'(2)|*eps ~ 0.25% of one tap (bc2 hits zero at dr=4) —
            # far below the golden tolerances. The bbox branch stays exact
            # (a bbox-included tap can carry full weight).
            eps_s = 0.005
            sx_m = jnp.where(
                good, 2.0 * jnp.sqrt(jnp.maximum(abc_z, 0.0)
                                     / jnp.maximum(det, 1e-9)), 1e9) - eps_s
            sy_m = jnp.where(
                good, 2.0 * jnp.sqrt(jnp.maximum(abc_x, 0.0)
                                     / jnp.maximum(det, 1e-9)), 1e9) - eps_s
            # Integer-exact per-side check: a cap-c rung is wrong for a
            # pixel iff some TRUNCATED tap (stencil covers integer offsets
            # -c..c+1 around floor(u/v)) is BOTH inside the reference bbox
            # AND inside the dr<=4 ellipse support (|fx| < extent). The
            # first truncated tap's |fx| is c+1+frac (left, offset -(c+1))
            # or c+2-frac (right, offset c+2); farther taps only grow |fx|,
            # and the bbox is an interval containing the stencil, so the
            # first truncated tap is the binding one per side. This replaces
            # the earlier conservative min(bbox, support) > cap float check
            # (which over-escalated by up to one full tap and kept real
            # content off the cap-2 rungs).
            bad = jnp.zeros_like(valid)
            if cfg.background_mode == 3:
                # feather mode samples at REMAPPED coords (two sample_all
                # calls below), so the frac/bbox refinement wouldn't align
                # with the kernel's bbox — keep the conservative float form
                if ewa_cap < 4:
                    bad = bad | (jnp.minimum(tx_m, sx_m) > cap_x)
                if ewa_cap_y < 4:
                    bad = bad | (jnp.minimum(ty_m, sy_m) > cap_y)
            else:
                if ewa_cap < 4:
                    frac_u = u - fu
                    bad = bad | ((fu - bbx0 > cap_x) &
                                 (cap_x + 1.0 + frac_u < sx_m))
                    bad = bad | ((bbx1 - fu - 1.0 > cap_x) &
                                 (cap_x + 2.0 - frac_u < sx_m))
                if ewa_cap_y < 4:
                    frac_v = v - fv
                    bad = bad | ((fv - bby0 > cap_y) &
                                 (cap_y + 1.0 + frac_v < sy_m))
                    bad = bad | ((bby1 - fv - 1.0 > cap_y) &
                                 (cap_y + 2.0 - frac_v < sy_m))
            capflow = (bad & valid).any()
            coords_overflow = coords_overflow | capflow

    imgs = jnp.moveaxis(img, -1, 0)

    def sample_all(uq, vq):
        if is_ewa:
            out_t, overflow = ps.sample_planes_ewa_t(
                spec, imgs, uq, vq, jac, valid, bg,
                (dyn.ewa_coeffs_p, dyn.ewa_coeffs_q))
        else:
            out_t, overflow = ps.sample_planes_t(spec, imgs, uq, vq, valid, bg)
        return jnp.minimum(out_t, dyn.pixel_value_limit), overflow

    if cfg.background_mode == 3:
        fw, fh = float(cfg.width), float(cfg.height)
        widthf, heightf = fw - 1.0, fh - 1.0
        feather = jnp.maximum(dyn.background_margin_feather * heightf, 0.0001)
        near_edge = (u > widthf - feather) | (u < feather) | (v > heightf - feather) | (v < feather)
        alpha = jnp.where(
            near_edge,
            jnp.clip(jnp.minimum(jnp.minimum(widthf - u, heightf - v), jnp.minimum(u, v)) / feather, 0.0, 1.0),
            1.0)
        pt2u = jnp.where(near_edge, ((u / fw - 0.5) * (1.0 - dyn.background_margin) + 0.5) * fw, u)
        pt2v = jnp.where(near_edge, ((v / fh - 0.5) * (1.0 - dyn.background_margin) + 0.5) * fh, v)
        frame_w, frame_h = (float(cfg.width), float(cfg.height)) if cfg.input_rotation == 0.0 \
            else _rotated_frame_size(cfg)
        srx, sry, srw, srh = cfg.src_rect
        c1, ov1 = sample_all(map_coord(u, 0.0, frame_w, float(srx), float(srx + srw)),
                             map_coord(v, 0.0, frame_h, float(sry), float(sry + srh)))
        c2, ov2 = sample_all(map_coord(pt2u, 0.0, frame_w, float(srx), float(srx + srw)),
                             map_coord(pt2v, 0.0, frame_h, float(sry), float(sry + srh)))
        pixel = c1 * alpha[None] + c2 * (1.0 - alpha[None])
        overflow = ov1 | ov2 | coords_overflow
    else:
        pixel, overflow = sample_all(u, v)
        overflow = overflow | coords_overflow

    # pixel is (C, ntiles, P); masks are (ntiles, P)
    bg_c = bg.reshape(C, 1, 1)
    pixel = jnp.where(valid[None], pixel, bg_c)

    orx, ory, orw, orh = cfg.out_rect
    lx = map_coord(ox, float(orx), float(orx + orw), 0.0, float(cfg.output_width))
    ly = map_coord(oy, float(ory), float(ory + orh), 0.0, float(cfg.output_height))
    in_bounds = (lx >= 0.0) & (ly >= 0.0) & (lx < cfg.output_width) & (ly < cfg.output_height)
    pixel = jnp.where(in_bounds[None], pixel, bg_c)

    if cfg.has(FIX_COLOR_RANGE):
        pixel = _remap_colorrange_t(pixel, cfg.plane_index == 0, dyn.max_pixel_value)

    if drawing is not None and cfg.has(DRAWING_ENABLED):
        pixel, ov_d = _draw_overlay_tiled(ps, spec, pixel, u, v, ox, oy, drawing,
                                          cfg, dyn)
        overflow = overflow | ov_d

    out = jnp.moveaxis(ps.out_untileize_c(spec, pixel), 0, -1)   # (oh, ow, C)
    return out, overflow


def _canvas_fetch_t(ps, canvas_f32, x, y, scale):
    """Exact nearest canvas fetch in tiled layout, gather-free: integer
    coordinates hit bilinear phase 0, so the sampler returns canvas[yi, xi]
    bit-exactly (byte values are exact in f32)."""
    hc, wc = canvas_f32.shape
    xi = jnp.floor(x / scale)
    yi = jnp.floor(y / scale)
    spec_c = ps.SamplerSpec.create(
        height=hc, width=wc, out_height=0, out_width=0, interpolation=2,
        win_h=64, win_w=512, source_rect=(0, 0, wc, hc), exact8=True)
    inb = (xi >= 0) & (yi >= 0) & (xi < wc) & (yi < hc)
    out_t, ov = ps.sample_planes_t(spec_c, canvas_f32[None],
                                   jnp.where(inb, xi, 0.0),
                                   jnp.where(inb, yi, 0.0), inb,
                                   jnp.zeros(1))
    data = jnp.where(inb, out_t[0], 0.0)
    return jnp.rint(data).astype(jnp.int32), ov


def _blend_overlay_t(pixel, data, active_extra, dyn):
    """draw_pixel blend (stabilize_spirv/src/drawing.rs:37-49) on tiled
    (C, ntiles, P) pixels with (ntiles, P) packed canvas bytes. Color table
    lookups are one-hot selects (gather-free); ALPHAS is arithmetic
    (1 - 0.25·idx)."""
    from ..core.drawing import COLORS
    color = (data & 0xF8) >> 3
    alpha_i = (data & 0x06) >> 1
    active = (data > 0) & (color < 9) & active_extra
    alphaf = 1.0 - 0.25 * alpha_i.astype(jnp.float32)
    C = pixel.shape[0]
    colorf = jnp.zeros(pixel.shape, jnp.float32)
    for ci in range(1, 9):
        sel = (color == ci)[None]
        col = jnp.asarray(COLORS[ci][:C], jnp.float32).reshape(C, 1, 1)
        colorf = jnp.where(sel, col, colorf)
    colorf = colorf * dyn.max_pixel_value
    blended = colorf * alphaf[None] + pixel * (1.0 - alphaf[None])
    return jnp.where(active[None], blended, pixel)


def _draw_overlay_tiled(ps, spec, pixel, u, v, ox, oy, drawing, cfg, dyn):
    """process_final_pixel's drawing stages (spirv drawing.rs:78-99) in the
    tiled Pallas pipeline: canvas fetches ride the sampling kernel."""
    canvas = jnp.asarray(drawing.canvas, jnp.float32)
    scale = jnp.float32(drawing.scale)
    # input stage, gated by source_rect
    srx, sry, srw, srh = cfg.src_rect
    src_in = (v >= float(sry)) & (v < float(sry + srh)) & \
             (u >= float(srx)) & (u < float(srx + srw))
    d_in, ov1 = _canvas_fetch_t(ps, canvas, u, v, scale)
    pixel = _blend_overlay_t(pixel, d_in, src_in & ((d_in & 1) == 0), dyn)
    # output stage
    d_out, ov2 = _canvas_fetch_t(ps, canvas, ox, oy, scale)
    pixel = _blend_overlay_t(pixel, d_out, (d_out & 1) == 1, dyn)
    # safe area dim (drawing.rs:52-69)
    if drawing.safe_area_rect is not None:
        rx, ry, rz, rw = [jnp.float32(vv) for vv in drawing.safe_area_rect]
        safe = (ox >= rx) & (ox <= rz) & (oy >= ry) & (oy <= rw)
        border = (ox > rx - 5.0) & (ox < rz + 5.0) & (oy > ry - 5.0) & (oy < rw + 5.0)
        dim = jnp.where(safe, 1.0, jnp.where(border, 0.25, 0.5))
        pixel = pixel * dim[None]
    return pixel, ov1 | ov2


def _remap_colorrange_t(px, is_y: bool, max_pixel_value):
    """_remap_colorrange for (C, ntiles, P) layout."""
    px = px * (0.85882352 if is_y else 0.87843137)
    return px + (16.0 / 255.0) * max_pixel_value


@functools.partial(jax.jit, static_argnames=("cfg", "win_h", "win_w", "out_rows",
                                             "tile_h", "tile_w", "win_k",
                                             "win_r", "fused", "win_m",
                                             "ewa_cap", "ewa_cap_y",
                                             "out_dtype"))
def remap_plane_pallas_jit(img, matrices, cfg: KernelConfig, dyn: KernelDynamics,
                           mesh=None, win_h: int = 64, win_w: int = 512,
                           drawing=None, out_rows: int = None, oy0=0,
                           tile_h: int = 8, tile_w: int = 128, win_k: int = 0,
                           win_r: int = 0, fused: bool = False,
                           win_m: int = 0, ewa_cap: int = 4,
                           ewa_cap_y: int = 4, out_dtype: str = "f32"):
    out, ov = remap_plane_pallas(img, matrices, cfg, dyn, mesh, win_h, win_w,
                                 drawing=drawing, out_rows=out_rows, oy0=oy0,
                                 tile_h=tile_h, tile_w=tile_w, win_k=win_k,
                                 win_r=win_r, fused=fused, win_m=win_m,
                                 ewa_cap=ewa_cap, ewa_cap_y=ewa_cap_y)
    return _cast_out(out, out_dtype, dyn), ov

"""Lens distortion models as JAX-traceable, vmappable functions.

Re-designs the reference's 14-model enum dispatch
(/root/reference/src/core/stabilization/distortion_models/mod.rs:92-110, each model
implemented 4x in Rust/OpenCL/WGSL/GLSL) as ONE set of pure jnp functions usable
both from batched jnp code (zoom solver, points path) and inside the remap kernel.

Semantics (verified against the Rust sources, cited per-model below):
- ``undistort(pt, p) -> (new_pt, valid)``: iterative inverse. Where the reference
  returns ``None``, ``valid`` is False and callers keep their fallback point.
  Data-dependent early breaks become masked fixed-iteration updates — once an
  element converges its value is frozen, so results match the reference's
  break-on-converge behaviour exactly (not just approximately).
- ``distort(x, y, z, p) -> pt``: forward model (always defined; gopro_warp uses
  the reference's (-99999,-99999) out-of-domain sentinel).

Model ids are stable and match the reference's serialization names
(``DistortionModel::from_name``). Everything is f32 end to end, matching the
GPU kernels (KernelParams carries f32 — stabilization/mod.rs:103-150).
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["LensParams", "MODELS", "MODEL_IDS", "get_model", "DistortionModel"]

PI = math.pi
EPS = 1e-6


class LensParams(NamedTuple):
    """Subset of kernel params the distortion models need (all f32 / arrays)."""
    k: jnp.ndarray                    # (12,) distortion coefficients
    digital_lens_params: jnp.ndarray  # (16,)
    width: jnp.ndarray                # input plane width (f32 scalar ok)
    height: jnp.ndarray
    output_width: jnp.ndarray
    output_height: jnp.ndarray

    @classmethod
    def make(cls, k=None, digital_lens_params=None, width=0, height=0,
             output_width=0, output_height=0):
        kk = jnp.zeros(12, jnp.float32) if k is None else jnp.asarray(k, jnp.float32)
        kk = jnp.concatenate([kk, jnp.zeros(12 - kk.shape[0], jnp.float32)]) if kk.shape[0] < 12 else kk[:12]
        dl = jnp.zeros(16, jnp.float32) if digital_lens_params is None else jnp.asarray(digital_lens_params, jnp.float32)
        dl = jnp.concatenate([dl, jnp.zeros(16 - dl.shape[0], jnp.float32)]) if dl.shape[0] < 16 else dl[:16]
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(kk, dl, f32(width), f32(height), f32(output_width), f32(output_height))


def _xy(pt):
    return pt[..., 0], pt[..., 1]


def _pack(x, y):
    return jnp.stack([x, y], axis=-1)


def _safe_div(a, b, fallback=0.0):
    bz = b == 0.0
    return jnp.where(bz, fallback, a / jnp.where(bz, 1.0, b))


# --------------------------------------------------------------------------
# OpenCV fisheye (opencv_fisheye.rs:12-113; OpenCV fisheye.cpp L257-460)
# --------------------------------------------------------------------------

def fisheye_undistort(pt, p: LensParams):
    k = p.k
    x, y = _xy(pt)
    theta_d = jnp.sqrt(x * x + y * y)
    theta_d = jnp.clip(theta_d, -PI, PI)

    need_iter = jnp.abs(theta_d) > EPS
    theta = jnp.zeros_like(theta_d)
    converged = jnp.zeros_like(theta_d, dtype=bool)
    for _ in range(10):
        theta2 = theta * theta
        theta4 = theta2 * theta2
        theta6 = theta4 * theta2
        theta8 = theta6 * theta2
        k0t2 = k[0] * theta2
        k1t4 = k[1] * theta4
        k2t6 = k[2] * theta6
        k3t8 = k[3] * theta8
        theta_fix = (theta * (1.0 + k0t2 + k1t4 + k2t6 + k3t8) - theta_d) / \
                    (1.0 + 3.0 * k0t2 + 5.0 * k1t4 + 7.0 * k2t6 + 9.0 * k3t8)
        theta_fix = jnp.clip(theta_fix, -0.9, 0.9)
        theta = jnp.where(converged, theta, theta - theta_fix)
        converged = converged | (jnp.abs(theta_fix) < EPS)

    scale = jnp.where(need_iter, _safe_div(jnp.tan(theta), theta_d), 0.0)
    converged = converged | ~need_iter
    theta_flipped = ((theta_d < 0.0) & (theta > 0.0)) | ((theta_d > 0.0) & (theta < 0.0))
    valid = converged & ~theta_flipped

    k_zero = (k[0] == 0.0) & (k[1] == 0.0) & (k[2] == 0.0) & (k[3] == 0.0)
    out = jnp.where(k_zero, pt, _pack(x * scale, y * scale))
    valid = jnp.where(k_zero, True, valid)
    return out, valid


def fisheye_distort(x, y, z, p: LensParams):
    k = p.k
    x = x / z
    y = y / z
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan(r)
    theta2 = theta * theta
    theta4 = theta2 * theta2
    theta6 = theta4 * theta2
    theta8 = theta4 * theta4
    theta_d = theta * (1.0 + k[0] * theta2 + k[1] * theta4 + k[2] * theta6 + k[3] * theta8)
    scale = jnp.where(r == 0.0, 1.0, _safe_div(theta_d, r, 1.0))
    k_zero = (k[0] == 0.0) & (k[1] == 0.0) & (k[2] == 0.0) & (k[3] == 0.0)
    scale = jnp.where(k_zero, 1.0, scale)
    return _pack(x * scale, y * scale)


# --------------------------------------------------------------------------
# OpenCV standard (opencv_standard.rs:13-48; OpenCV undistort.dispatch.cpp)
# --------------------------------------------------------------------------

def opencv_standard_undistort(pt, p: LensParams):
    k = p.k
    x0, y0 = _xy(pt)
    x, y = x0, y0
    valid = jnp.ones_like(x0, dtype=bool)
    for _ in range(20):
        r2 = x * x + y * y
        icdist = (1.0 + ((k[7] * r2 + k[6]) * r2 + k[5]) * r2) / \
                 (1.0 + ((k[4] * r2 + k[1]) * r2 + k[0]) * r2)
        valid = valid & (icdist >= 0.0)
        delta_x = 2.0 * k[2] * x * y + k[3] * (r2 + 2.0 * x * x) + k[8] * r2 + k[9] * r2 * r2
        delta_y = k[2] * (r2 + 2.0 * y * y) + 2.0 * k[3] * x * y + k[10] * r2 + k[11] * r2 * r2
        x = jnp.where(valid, (x0 - delta_x) * icdist, x)
        y = jnp.where(valid, (y0 - delta_y) * icdist, y)
    return _pack(x, y), valid


def opencv_standard_distort(x, y, z, p: LensParams):
    k = p.k
    x = x / z
    y = y / z
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    a1 = 2.0 * x * y
    a2 = r2 + 2.0 * x * x
    a3 = r2 + 2.0 * y * y
    cdist = 1.0 + k[0] * r2 + k[1] * r4 + k[4] * r6
    icdist2 = 1.0 / (1.0 + k[5] * r2 + k[6] * r4 + k[7] * r6)
    xd0 = x * cdist * icdist2 + k[2] * a1 + k[3] * a2 + k[8] * r2 + k[9] * r4
    yd0 = y * cdist * icdist2 + k[2] * a3 + k[3] * a1 + k[10] * r2 + k[11] * r4
    return _pack(xd0, yd0)


# --------------------------------------------------------------------------
# LensFun radial family: poly3 / poly5 / ptlens (poly3.rs, poly5.rs, ptlens.rs)
# Newton with: break on |f|<eps; bail out (invalid) if not converged by i>5.
# --------------------------------------------------------------------------

NEWTON_EPS = 1e-5


def _lensfun_newton(rd, f, fprime):
    """7 reference iterations (i=0..6): masked Newton; valid iff converged by i==6."""
    ru = rd
    converged = jnp.zeros_like(rd, dtype=bool)
    for _ in range(7):
        fru = f(ru)
        converged = converged | ((fru >= -NEWTON_EPS) & (fru < NEWTON_EPS))
        ru = jnp.where(converged, ru, ru - fru / fprime(ru))
    # after the i==6 check the reference either broke (converged) or returned None
    fru = f(ru)
    converged = converged | ((fru >= -NEWTON_EPS) & (fru < NEWTON_EPS))
    return ru, converged


def poly3_undistort(pt, p: LensParams):
    k = p.k
    x, y = _xy(pt)
    inv_k1 = 1.0 / k[0]
    rd = jnp.sqrt(x * x + y * y)
    rd_nz = rd != 0.0
    rd_s = jnp.where(rd_nz, rd, 1.0)
    ru, converged = _lensfun_newton(
        rd_s,
        lambda ru: ru * ru * ru + ru * inv_k1 - rd_s * inv_k1,
        lambda ru: 3.0 * ru * ru + inv_k1,
    )
    valid = rd_nz & converged & (ru >= 0.0)
    s = ru / rd_s
    return _pack(x * s, y * s), valid


def poly3_distort(x, y, z, p: LensParams):
    x = x / z
    y = y / z
    poly2 = p.k[0] * (x * x + y * y) + 1.0
    return _pack(x * poly2, y * poly2)


def poly5_undistort(pt, p: LensParams):
    k = p.k
    x, y = _xy(pt)
    rd = jnp.sqrt(x * x + y * y)
    rd_nz = rd != 0.0
    rd_s = jnp.where(rd_nz, rd, 1.0)
    ru, converged = _lensfun_newton(
        rd_s,
        lambda ru: ru * (1.0 + k[0] * ru * ru + k[1] * (ru * ru) * (ru * ru)) - rd_s,
        lambda ru: 1.0 + 3.0 * k[0] * ru * ru + 5.0 * k[1] * (ru * ru) * (ru * ru),
    )
    valid = rd_nz & converged & (ru >= 0.0)
    s = ru / rd_s
    return _pack(x * s, y * s), valid


def poly5_distort(x, y, z, p: LensParams):
    x = x / z
    y = y / z
    ru2 = x * x + y * y
    poly4 = 1.0 + p.k[0] * ru2 + p.k[1] * ru2 * ru2
    return _pack(x * poly4, y * poly4)


def ptlens_undistort(pt, p: LensParams):
    k = p.k
    x, y = _xy(pt)
    rd = jnp.sqrt(x * x + y * y)
    rd_nz = rd != 0.0
    rd_s = jnp.where(rd_nz, rd, 1.0)
    ru, converged = _lensfun_newton(
        rd_s,
        lambda ru: ru * (k[0] * ru * ru * ru + k[1] * ru * ru + k[2] * ru + 1.0) - rd_s,
        lambda ru: 4.0 * k[0] * ru * ru * ru + 3.0 * k[1] * ru * ru + 2.0 * k[2] * ru + 1.0,
    )
    valid = rd_nz & converged & (ru >= 0.0)
    s = ru / rd_s
    return _pack(x * s, y * s), valid


def ptlens_distort(x, y, z, p: LensParams):
    k = p.k
    x = x / z
    y = y / z
    ru2 = x * x + y * y
    r = jnp.sqrt(ru2)
    poly3 = k[0] * ru2 * r + k[1] * ru2 + k[2] * r + 1.0
    return _pack(x * poly3, y * poly3)


# --------------------------------------------------------------------------
# Insta360 unified-sphere model (insta360.rs:10-48)
# --------------------------------------------------------------------------

def insta360_distort(x, y, z, p: LensParams):
    k = p.k
    k1, k2, k3, p1, p2, xi = k[0], k[1], k[2], k[3], k[4], k[5]
    ln = jnp.sqrt(x * x + y * y + z * z)
    d = (z / ln) + xi
    xs = (x / ln) / d
    ys = (y / ln) / d
    r2 = xs * xs + ys * ys
    r4 = r2 * r2
    r6 = r4 * r2
    radial = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    return _pack(
        xs * radial + 2.0 * p1 * xs * ys + p2 * (r2 + 2.0 * xs * xs),
        ys * radial + 2.0 * p2 * xs * ys + p1 * (r2 + 2.0 * ys * ys),
    )


def insta360_undistort(pt, p: LensParams):
    x0, y0 = _xy(pt)

    def body(_, carry):
        px, py, done = carry
        dp = insta360_distort(px, py, jnp.ones_like(px), p)
        dx = dp[..., 0] - x0
        dy = dp[..., 1] - y0
        done = done | ((jnp.abs(dx) < 1e-6) & (jnp.abs(dy) < 1e-6))
        px = jnp.where(done, px, px - dx)
        py = jnp.where(done, py, py - dy)
        return px, py, done

    done0 = jnp.zeros_like(x0, dtype=bool)
    px, py, _ = jax.lax.fori_loop(0, 200, body, (x0, y0, done0))
    return _pack(px, py), jnp.ones_like(x0, dtype=bool)


# --------------------------------------------------------------------------
# Sony (sony.rs:10-109): 6-term odd-free polynomial in theta with k0 scale
# --------------------------------------------------------------------------

def sony_undistort(pt, p: LensParams):
    k = p.k
    x, y = _xy(pt)
    theta_d = jnp.sqrt(x * x + y * y)
    need_iter = jnp.abs(theta_d) > EPS
    theta = jnp.zeros_like(theta_d)
    converged = jnp.zeros_like(theta_d, dtype=bool)
    for _ in range(10):
        t2 = theta * theta
        t3 = t2 * theta
        t4 = t2 * t2
        t5 = t2 * t3
        k1t = k[1] * theta
        k2t = k[2] * t2
        k3t = k[3] * t3
        k4t = k[4] * t4
        k5t = k[5] * t5
        theta_fix = (theta * (k[0] + k1t + k2t + k3t + k4t + k5t) - theta_d) / \
                    (k[0] + 2.0 * k1t + 3.0 * k2t + 4.0 * k3t + 5.0 * k4t + 6.0 * k5t)
        theta = jnp.where(converged, theta, theta - theta_fix)
        converged = converged | (jnp.abs(theta_fix) < EPS)
    scale = jnp.where(need_iter, _safe_div(jnp.tan(theta), theta_d), 0.0)
    converged = converged | ~need_iter
    theta_flipped = ((theta_d < 0.0) & (theta > 0.0)) | ((theta_d > 0.0) & (theta < 0.0))
    valid = converged & ~theta_flipped
    k_zero = (k[0] == 0.0) & (k[1] == 0.0) & (k[2] == 0.0) & (k[3] == 0.0)
    out = jnp.where(k_zero, pt, _pack(x * scale, y * scale))
    return out, jnp.where(k_zero, True, valid)


def sony_distort(x, y, z, p: LensParams):
    k = p.k
    x = x / z
    y = y / z
    r = jnp.sqrt(x * x + y * y)
    t = jnp.arctan(r)
    t2 = t * t
    t3 = t2 * t
    t4 = t2 * t2
    t5 = t2 * t3
    t6 = t3 * t3
    theta_d = t * k[0] + t2 * k[1] + t3 * k[2] + t4 * k[3] + t5 * k[4] + t6 * k[5]
    scale = jnp.where(r == 0.0, 1.0, _safe_div(theta_d, r, 1.0))
    k_zero = (k[0] == 0.0) & (k[1] == 0.0) & (k[2] == 0.0) & (k[3] == 0.0)
    scale = jnp.where(k_zero, 1.0, scale)
    return _pack(x * scale, y * scale)


# --------------------------------------------------------------------------
# Generic polynomial (generic_polynomial.rs): 12 terms theta^1..theta^12
# --------------------------------------------------------------------------

def generic_poly_undistort(pt, p: LensParams):
    k = p.k
    x, y = _xy(pt)
    theta_d = jnp.sqrt(x * x + y * y)
    need_iter = jnp.abs(theta_d) > EPS
    theta = jnp.zeros_like(theta_d)
    converged = jnp.zeros_like(theta_d, dtype=bool)
    for _ in range(10):
        num = jnp.zeros_like(theta)
        den = jnp.zeros_like(theta)
        tp = jnp.ones_like(theta)
        for i in range(12):
            term = k[i] * tp
            num = num + term
            den = den + (i + 1.0) * term
            tp = tp * theta
        theta_fix = (theta * num - theta_d) / den
        theta = jnp.where(converged, theta, theta - theta_fix)
        converged = converged | (jnp.abs(theta_fix) < EPS)
    scale = jnp.where(need_iter, _safe_div(jnp.tan(theta), theta_d), 0.0)
    converged = converged | ~need_iter
    theta_flipped = ((theta_d < 0.0) & (theta > 0.0)) | ((theta_d > 0.0) & (theta < 0.0))
    valid = converged & ~theta_flipped
    k_zero = jnp.all(k == 0.0)
    out = jnp.where(k_zero, pt, _pack(x * scale, y * scale))
    return out, jnp.where(k_zero, True, valid)


def generic_poly_distort(x, y, z, p: LensParams):
    k = p.k
    x = x / z
    y = y / z
    r = jnp.sqrt(x * x + y * y)
    t = jnp.arctan(r)
    theta_d = jnp.zeros_like(t)
    tp = t
    for i in range(12):
        theta_d = theta_d + tp * k[i]
        tp = tp * t
    scale = jnp.where(r == 0.0, 1.0, _safe_div(theta_d, r, 1.0))
    k_zero = jnp.all(k == 0.0)
    scale = jnp.where(k_zero, 1.0, scale)
    return _pack(x * scale, y * scale)


# --------------------------------------------------------------------------
# GoPro native POLY model (gopro.rs): world_radians = POLY(r_norm / k1)
# --------------------------------------------------------------------------

_GOPRO_TMAX = 1.5533  # ~89 deg, see gopro.rs angle-clamp comments


def _gopro_poly_eval(pp, k):
    return k[0] + pp * (k[1] + pp * (k[2] + pp * (k[3] + pp * (k[4] + pp * (k[5] + pp * k[6])))))


def _gopro_poly_deriv(pp, k):
    return k[1] + pp * (2.0 * k[2] + pp * (3.0 * k[3] + pp * (4.0 * k[4] + pp * (5.0 * k[5] + pp * (6.0 * k[6])))))


def _gopro_poly_invert(theta, k):
    pp = (theta - k[0]) / k[1]
    done = jnp.zeros_like(theta, dtype=bool)
    for _ in range(10):
        d = _gopro_poly_deriv(pp, k)
        done = done | (jnp.abs(d) < 1e-12)
        fix = (_gopro_poly_eval(pp, k) - theta) / jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
        pp = jnp.where(done, pp, pp - fix)
        done = done | (jnp.abs(fix) < 1e-7)
    return pp


def gopro_undistort(pt, p: LensParams):
    k = p.k
    x, y = _xy(pt)
    r_norm = jnp.sqrt(x * x + y * y)
    trivial = (k[1] == 0.0) | (r_norm < 1e-9)
    r_safe = jnp.where(r_norm < 1e-9, 1.0, r_norm)
    pp = r_safe / k[1]
    theta = _gopro_poly_eval(pp, k)
    tt = math.tan(_GOPRO_TMAX)
    rr = jnp.where(theta < _GOPRO_TMAX, jnp.tan(jnp.minimum(theta, _GOPRO_TMAX)),
                   tt + (theta - _GOPRO_TMAX) * (1.0 + tt * tt))
    scale = rr / r_safe
    out = jnp.where(trivial[..., None], pt, _pack(x * scale, y * scale))
    return out, jnp.ones_like(x, dtype=bool)


def gopro_distort(x, y, z, p: LensParams):
    k = p.k
    x = x / z
    y = y / z
    r = jnp.sqrt(x * x + y * y)
    tt = math.tan(_GOPRO_TMAX)
    theta = jnp.where(r < tt, jnp.arctan(jnp.minimum(r, tt)), _GOPRO_TMAX + (r - tt) / (1.0 + tt * tt))
    pp = _gopro_poly_invert(theta, k)
    r_norm = k[1] * pp
    scale = jnp.where(r < 1e-9, 1.0, r_norm / jnp.where(r < 1e-9, 1.0, r))
    trivial = k[1] == 0.0
    scale = jnp.where(trivial, 1.0, scale)
    return _pack(x * scale, y * scale)


# --------------------------------------------------------------------------
# Digital lenses (operate in pixel coords): GoPro Superview/6SV/Hyperview/Warp,
# DigitalStretch (gopro_superview.rs etc.)
# --------------------------------------------------------------------------

def _fixed_point_invert(fn, tx, ty, iters=12):
    px, py = tx, ty
    done = jnp.zeros_like(tx, dtype=bool)
    for _ in range(iters):
        fx, fy = fn(px, py)
        dx = fx - tx
        dy = fy - ty
        done = done | ((jnp.abs(dx) < 1e-6) & (jnp.abs(dy) < 1e-6))
        px = jnp.where(done, px, px - dx)
        py = jnp.where(done, py, py - dy)
    return px, py


def _superview_fn(x, y):
    x2 = x * x
    y2 = y * y
    return (
        x * (1.2100393 + x2 * (-1.2758402 + x2 * 1.7751845)),
        y * (0.9364505 + (0.4465308 - 0.7683315 * y2) * y2 + (-0.3574087 + 1.1584653 * y2 + 0.3529348 * x2) * x2),
    )


def superview_undistort(pt, p: LensParams):
    u = pt[..., 0] / p.output_width - 0.5
    v = pt[..., 1] / p.output_height - 0.5
    x, y = _superview_fn(u, v)
    x = x / 1.333333333
    return _pack((x + 0.5) * p.output_width, (y + 0.5) * p.output_height), jnp.ones_like(u, dtype=bool)


def superview_distort(x, y, z, p: LensParams):
    u = x / p.width - 0.5
    v = y / p.height - 0.5
    u = u * 1.333333333
    px, py = _fixed_point_invert(_superview_fn, u, v)
    return _pack((px + 0.5) * p.width, (py + 0.5) * p.height)


def _superview6_fn(x, y):
    x = x * (1.0 - 0.48 * jnp.abs(x))
    x = x * (0.943396 * (1.0 + 0.157895 * jnp.abs(x)))
    y = y * (0.943396 * (1.0 + 0.060000 * jnp.abs(y * 2.0)))
    return x, y


def superview6_undistort(pt, p: LensParams):
    u = pt[..., 0] / p.output_width - 0.5
    v = pt[..., 1] / p.output_height - 0.5
    x, y = _superview6_fn(u, v)
    return _pack((x + 0.5) * p.output_width, (y + 0.5) * p.output_height), jnp.ones_like(u, dtype=bool)


def superview6_distort(x, y, z, p: LensParams):
    u = x / p.width - 0.5
    v = y / p.height - 0.5
    px, py = _fixed_point_invert(_superview6_fn, u, v)
    return _pack((px + 0.5) * p.width, (py + 0.5) * p.height)


def _hyperview_fn(x, y):
    x2 = x * x
    y2 = y * y
    return (
        x * (1.5805143 + x2 * (-8.1668825 + x2 * (74.5198746 + x2 * (-451.5002441 + x2 * (1551.2922363 + x2 * (-2735.5422363 + x2 * 1923.1572266))))) + y2 * -0.1086027),
        y * (1.0238225 + y2 * -0.1025671 + x2 * (-0.2639930 + x2 * 0.2979266)),
    )


def hyperview_undistort(pt, p: LensParams):
    u = pt[..., 0] / p.output_width - 0.5
    v = pt[..., 1] / p.output_height - 0.5
    x, y = _hyperview_fn(u, v)
    x = x / 1.555555555
    return _pack((x + 0.5) * p.output_width, (y + 0.5) * p.output_height), jnp.ones_like(u, dtype=bool)


def hyperview_distort(x, y, z, p: LensParams):
    u = x / p.width - 0.5
    v = y / p.height - 0.5
    u = u * 1.555555555
    px, py = _fixed_point_invert(_hyperview_fn, u, v)
    return _pack((px + 0.5) * p.width, (py + 0.5) * p.height)


def _gopro_warp_fn(dl):
    def fn(u, v):
        x = jnp.clip(u, -0.5, 0.5)
        y = jnp.clip(v, -0.5, 0.5)
        x2 = x * x
        y2 = y * y
        poly_x = dl[0] + x2 * (dl[1] + x2 * (dl[2] + x2 * (dl[3] + x2 * (dl[4] + x2 * (dl[5] + x2 * dl[6])))))
        return (
            x * (poly_x + dl[7] * y2) + (u - x),
            y * (dl[8] + dl[9] * y2 + dl[10] * y2 * y2 + x2 * (dl[11] + dl[12] * y2 + dl[13] * x2)) + (v - y),
        )
    return fn


def gopro_warp_undistort(pt, p: LensParams):
    dl = p.digital_lens_params
    factor = jnp.where(dl[14] != 0.0, dl[14], 1.0)
    u = pt[..., 0] / p.output_width - 0.5
    v = pt[..., 1] / p.output_height - 0.5
    x, y = _gopro_warp_fn(dl)(u, v)
    x = x / factor
    return _pack((x + 0.5) * p.output_width, (y + 0.5) * p.output_height), jnp.ones_like(u, dtype=bool)


def gopro_warp_distort(x, y, z, p: LensParams):
    dl = p.digital_lens_params
    factor = jnp.where(dl[14] != 0.0, dl[14], 1.0)
    u = x / p.width - 0.5
    v = y / p.height - 0.5
    fn = _gopro_warp_fn(dl)
    tx = u * factor
    px, py = _fixed_point_invert(fn, tx, v)
    rx, ry = fn(px, py)
    bad = (jnp.abs(rx - tx) > 0.02) | (jnp.abs(ry - v) > 0.02)
    ox = (px + 0.5) * p.width
    oy = (py + 0.5) * p.height
    return _pack(jnp.where(bad, -99999.0, ox), jnp.where(bad, -99999.0, oy))


def digital_stretch_undistort(pt, p: LensParams):
    dl = p.digital_lens_params
    return _pack(pt[..., 0] / dl[0], pt[..., 1] / dl[1]), jnp.ones_like(pt[..., 0], dtype=bool)


def digital_stretch_distort(x, y, z, p: LensParams):
    dl = p.digital_lens_params
    return _pack(x * dl[0], y * dl[1])


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

class DistortionModel(NamedTuple):
    id: str
    name: str
    undistort: Callable    # (pt(...,2), LensParams) -> (pt(...,2), valid(...))
    distort: Callable      # (x, y, z, LensParams) -> pt(...,2)
    is_digital: bool = False


MODELS = {
    "opencv_fisheye": DistortionModel("opencv_fisheye", "OpenCV Fisheye", fisheye_undistort, fisheye_distort),
    "opencv_standard": DistortionModel("opencv_standard", "OpenCV Standard", opencv_standard_undistort, opencv_standard_distort),
    "poly3": DistortionModel("poly3", "Poly3", poly3_undistort, poly3_distort),
    "poly5": DistortionModel("poly5", "Poly5", poly5_undistort, poly5_distort),
    "ptlens": DistortionModel("ptlens", "PTLens", ptlens_undistort, ptlens_distort),
    "insta360": DistortionModel("insta360", "Insta360", insta360_undistort, insta360_distort),
    "sony": DistortionModel("sony", "Sony", sony_undistort, sony_distort),
    "generic_polynomial": DistortionModel("generic_polynomial", "Generic polynomial", generic_poly_undistort, generic_poly_distort),
    "gopro": DistortionModel("gopro", "GoPro", gopro_undistort, gopro_distort),
    "gopro_superview": DistortionModel("gopro_superview", "GoPro Superview", superview_undistort, superview_distort, True),
    "gopro6_superview": DistortionModel("gopro6_superview", "GoPro6 Superview", superview6_undistort, superview6_distort, True),
    "gopro_hyperview": DistortionModel("gopro_hyperview", "GoPro Hyperview", hyperview_undistort, hyperview_distort, True),
    "gopro_warp": DistortionModel("gopro_warp", "GoPro warp", gopro_warp_undistort, gopro_warp_distort, True),
    "digital_stretch": DistortionModel("digital_stretch", "Digital stretch", digital_stretch_undistort, digital_stretch_distort, True),
}

MODEL_IDS = {name: i for i, name in enumerate(MODELS)}


def get_model(name: str | None) -> DistortionModel:
    """Resolve by id, defaulting to opencv_fisheye like the reference."""
    if not name:
        return MODELS["opencv_fisheye"]
    return MODELS.get(name, MODELS["opencv_fisheye"])


def radial_distortion_limit(model: DistortionModel, k) -> float | None:
    """Bisection on the distortion derivative (distortion_models/mod.rs:51-75).

    Host-side (runs once per lens); returns tan(theta_max) or None.
    """
    import numpy as np
    k = np.asarray(k, dtype=np.float64)

    def deriv(theta):
        if model.id == "opencv_fisheye":
            if len(k) < 4: return None
            t2 = theta * theta
            return 1.0 + 3*k[0]*t2 + 5*k[1]*t2*t2 + 7*k[2]*t2**3 + 9*k[3]*t2**4
        if model.id == "opencv_standard":
            if len(k) < 8: return None
            r2 = theta * theta
            return (1.0 + ((k[7]*r2 + k[6])*r2 + k[5])*r2) / (1.0 + ((k[4]*r2 + k[1])*r2 + k[0])*r2)
        if model.id == "poly3":
            if len(k) < 1 or k[0] == 0: return None
            return 3.0*theta*theta + 1.0/k[0]
        if model.id == "poly5":
            if len(k) < 2: return None
            r2 = theta * theta
            return 1.0 + 3.0*k[0]*r2 + 5.0*k[1]*r2*r2
        if model.id == "ptlens":
            if len(k) < 3: return None
            return 4.0*k[0]*theta**3 + 3.0*k[1]*theta*theta + 2.0*k[2]*theta + 1.0
        if model.id == "sony":
            if len(k) < 6: return None
            return k[0] + 2*k[1]*theta + 3*k[2]*theta**2 + 4*k[3]*theta**3 + 5*k[4]*theta**4 + 6*k[5]*theta**5
        if model.id == "generic_polynomial":
            if len(k) == 0: return None
            n = min(len(k), 12)
            return sum((i + 1.0) * k[i] * theta**i for i in range(n))
        if model.id == "gopro":
            if len(k) < 2 or k[1] == 0: return None
            ev = lambda pp: sum(k[i] * pp**i for i in range(len(k)))
            dv = lambda pp: sum(i * k[i] * pp**(i-1) for i in range(1, len(k)))
            pp = (theta - k[0]) / k[1]
            for _ in range(10):
                d = dv(pp)
                if abs(d) < 1e-12: break
                fix = (ev(pp) - theta) / d
                pp -= fix
                if abs(fix) < 1e-9: break
            return k[1] * dv(pp)
        return None

    max_theta = math.pi / 2.0
    low, high = 0.0, max_theta
    while high - low > 1e-4:
        mid = (low + high) / 2.0
        d = deriv(mid)
        if d is None:
            return None
        if d > 0.0:
            low = mid
        else:
            high = mid
    theta_max = (low + high) / 2.0
    if abs(theta_max - max_theta) > 0.001:
        return math.tan(theta_max)
    return None

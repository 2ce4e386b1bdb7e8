"""Sony lens mesh correction + focal-plane distortion — device (jnp) path.

Implements the per-pixel mesh stage of rotate_and_distort
(cpu_undistort.rs:169-214) on the reference's mesh buffer layout
(core/splines.py docstring). Gather-free: the per-pixel row/column selects use
one-hot masked sums over the tiny (<=9) grid — Pallas/Mosaic-safe elementwise.
Grid dims are trace-time constants (KernelConfig.mesh_grid).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.splines import MAX_GRID_SIZE


def _map_coord(x, in_min, in_max, out_min, out_max):
    return (x - in_min) * (out_max - out_min) / (in_max - in_min) + out_min


def _solve_spline(vals, size, n):
    """Natural cubic spline coefficients (splines.rs:96-124), unrolled.

    ``vals``: list of n same-shape arrays. Returns coefficient lists a,b,c,d."""
    h = size / (n - 1)
    inv_h = 1.0 / h
    a = vals
    mus = [jnp.zeros_like(a[0])] * n
    zs = [jnp.zeros_like(a[0])] * n
    for i in range(1, n - 1):
        alpha_i = 3.0 * inv_h * (a[i + 1] - 2.0 * a[i] + a[i - 1])
        mus[i] = 1.0 / (4.0 - mus[i - 1])
        zs[i] = (alpha_i * inv_h - zs[i - 1]) * mus[i]
    c = [None] * n
    b = [None] * n
    d = [None] * n
    c[n - 1] = jnp.zeros_like(a[0])
    for j in range(n - 2, -1, -1):
        c[j] = zs[j] - mus[j] * c[j + 1]
        b[j] = (a[j + 1] - a[j]) * inv_h - (h / 3.0) * (c[j + 1] + 2.0 * c[j])
        d[j] = (c[j + 1] - c[j]) / (3.0 * h)
    b[n - 1] = jnp.zeros_like(a[0])
    d[n - 1] = jnp.zeros_like(a[0])
    return a, b, c, d


def _spline_eval(a, b, c, d, n, x, size):
    """splines.rs:126-141 with one-hot segment select."""
    h = size / (n - 1)
    fi = jnp.clip(jnp.floor((n - 1) * x / size).astype(jnp.int32), 0, n - 2)
    res = jnp.zeros_like(x)
    for i in range(n - 1):
        dx = x - size * i / (n - 1)
        seg = a[i] + b[i] * dx + c[i] * dx * dx + d[i] * dx * dx * dx
        res = res + jnp.where(fi == i, seg, 0.0)
    below = a[0] + b[0] * x
    slope = b[n - 2] + 2.0 * c[n - 2] * h + 3.0 * d[n - 2] * h * h
    above = a[n - 1] + slope * (x - size)
    res = jnp.where(x <= 0.0, below, res)
    res = jnp.where(x >= size, above, res)
    return res


def _bivariate(mesh, mesh_offset, gx, gy, size_x, size_y, n_x, n_y):
    """BivariateSpline::interpolate (splines.rs:143-172) per pixel."""
    grid = MAX_GRID_SIZE
    raw_len = n_x * n_y * 2
    block = grid * 4
    coeff_base = 9 + raw_len + mesh_offset * n_y * block

    fi = jnp.clip(jnp.floor((n_x - 1) * gx / size_x).astype(jnp.int32), 0, n_x - 2)
    dx = gx - size_x * fi.astype(jnp.float32) / (n_x - 1)
    dx2 = dx * dx
    inter = []
    for j in range(n_y):
        val = jnp.zeros_like(gx)
        for i in range(n_x - 1):
            rb = coeff_base + i + j * block
            seg = (mesh[rb] + mesh[rb + grid] * dx +
                   mesh[rb + 2 * grid] * dx2 + mesh[rb + 3 * grid] * dx2 * dx)
            val = val + jnp.where(fi == i, seg, 0.0)
        inter.append(val)

    a, b, c, d = _solve_spline(inter, size_y, n_y)
    return _spline_eval(a, b, c, d, n_y, gy, size_y)


def apply_mesh_correction(u, v, mesh, cfg):
    """Mesh stage of rotate_and_distort (cpu_undistort.rs:169-185)."""
    n_x, n_y = cfg.mesh_grid
    width = float(cfg.width)
    height = float(cfg.height)
    size_x = mesh[3]
    size_y = mesh[4]
    ox, oy = mesh[5], mesh[6]
    cw, ch = mesh[7], mesh[8]

    inv = cfg.has(128)  # FRAMEBUFFER_INVERTED
    if inv:
        v = height - v
    mu = _map_coord(u, 0.0, width, ox, ox + cw)
    mv = _map_coord(v, 0.0, height, oy, oy + ch)
    nx = _bivariate(mesh, 0, mu, mv, size_x, size_y, n_x, n_y)
    ny = _bivariate(mesh, 1, mu, mv, size_x, size_y, n_x, n_y)
    u = _map_coord(nx, ox, ox + cw, 0.0, width)
    v = _map_coord(ny, oy, oy + ch, 0.0, height)
    if inv:
        v = height - v
    return u, v


def apply_focal_plane_distortion(u, v, mesh, fpd_offset: int, cfg, sign: float = -1.0):
    """FPD stage (cpu_undistort.rs:188-214). ``sign``=+1 for the points path."""
    width = float(cfg.width)
    height = float(cfg.height)
    size_y = mesh[4]
    ox, oy = mesh[5], mesh[6]
    cw, ch = mesh[7], mesh[8]
    stblz_grid = size_y / 8.0
    o = fpd_offset

    inv = cfg.has(128)
    if inv:
        v = height - v
    mu = _map_coord(u, 0.0, width, ox, ox + cw)
    mv = _map_coord(v, 0.0, height, oy, oy + ch)

    idx = jnp.clip(jnp.floor(mv / stblz_grid), 0.0, 7.0).astype(jnp.int32)
    delta = mv - stblz_grid * idx.astype(jnp.float32)
    dx_total = jnp.zeros_like(mu)
    dy_total = jnp.zeros_like(mv)
    for i in range(8):
        sel = idx == i
        dx_total = dx_total + jnp.where(sel, mesh[o + 4 + i * 2] * delta, 0.0)
        dy_total = dy_total + jnp.where(sel, mesh[o + 4 + i * 2 + 1] * delta, 0.0)
    for j in range(7):
        m = idx > j
        dx_total = dx_total + jnp.where(m, mesh[o + 4 + j * 2] * stblz_grid, 0.0)
        dy_total = dy_total + jnp.where(m, mesh[o + 4 + j * 2 + 1] * stblz_grid, 0.0)

    mu = mu + sign * dx_total
    mv = mv + sign * dy_total

    u = _map_coord(mu, ox, ox + cw, 0.0, width)
    v = _map_coord(mv, oy, oy + ch, 0.0, height)
    if inv:
        v = height - v
    return u, v

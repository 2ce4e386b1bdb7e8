"""Golden oracle: scalar per-pixel reference implementation of the remap.

Independent reimplementation of the reference CPU path
(/root/reference/src/core/stabilization/cpu_undistort.rs:133-625) with LITERAL
control flow: real early breaks in the iterative solvers, per-pixel Python
loops, OpenCV LUT sampling. Deliberately written in a different style from the
production JAX pipeline (scalar vs masked-vectorized) so bugs don't correlate.

Slow by design — use on tiny frames (<= 64x64) in tests.
"""
from __future__ import annotations

import math

import numpy as np

from gyroflow_tpu.ops.interpolation import COEFFS, INTERP_INFO

PI = math.pi


def map_coord(x, in_min, in_max, out_min, out_max):
    return (x - in_min) * (out_max - out_min) / (in_max - in_min) + out_min


# ---------------- scalar distortion models (literal Rust control flow) -------

def fisheye_undistort(px, py, k):
    if k[0] == 0 and k[1] == 0 and k[2] == 0 and k[3] == 0:
        return (px, py)
    EPS = 1e-6
    theta_d = math.sqrt(px * px + py * py)
    theta_d = min(max(theta_d, -PI), PI)
    converged = False
    theta = theta_d
    scale = 0.0
    if abs(theta_d) > EPS:
        theta = 0.0
        for _ in range(10):
            t2 = theta * theta
            t4 = t2 * t2
            t6 = t4 * t2
            t8 = t6 * t2
            k0t2, k1t4, k2t6, k3t8 = k[0] * t2, k[1] * t4, k[2] * t6, k[3] * t8
            fix = (theta * (1 + k0t2 + k1t4 + k2t6 + k3t8) - theta_d) / \
                  (1 + 3 * k0t2 + 5 * k1t4 + 7 * k2t6 + 9 * k3t8)
            fix = min(max(fix, -0.9), 0.9)
            theta -= fix
            if abs(fix) < EPS:
                converged = True
                break
        scale = math.tan(theta) / theta_d
    else:
        converged = True
    flipped = (theta_d < 0 < theta) or (theta_d > 0 > theta)
    if converged and not flipped:
        return (px * scale, py * scale)
    return None


def fisheye_distort(x, y, z, k):
    x, y = x / z, y / z
    if k[0] == 0 and k[1] == 0 and k[2] == 0 and k[3] == 0:
        return (x, y)
    r = math.sqrt(x * x + y * y)
    theta = math.atan(r)
    t2 = theta * theta
    t4 = t2 * t2
    t6 = t4 * t2
    t8 = t4 * t4
    theta_d = theta * (1 + k[0] * t2 + k[1] * t4 + k[2] * t6 + k[3] * t8)
    scale = 1.0 if r == 0 else theta_d / r
    return (x * scale, y * scale)


def stretch_undistort(px, py, p):
    return (px / p["digital_lens_params"][0], py / p["digital_lens_params"][1])


def stretch_distort(x, y, z, p):
    return (x * p["digital_lens_params"][0], y * p["digital_lens_params"][1])


def _superview(x, y):
    x2 = x * x
    y2 = y * y
    return (
        x * (1.2100393 + x2 * (-1.2758402 + x2 * 1.7751845)),
        y * (0.9364505 + (0.4465308 - 0.7683315 * y2) * y2 + (-0.3574087 + 1.1584653 * y2 + 0.3529348 * x2) * x2),
    )


def superview_undistort(px, py, p):
    ow, oh = p["output_width"], p["output_height"]
    x = px / ow - 0.5
    y = py / oh - 0.5
    x, y = _superview(x, y)
    x /= 1.333333333
    return ((x + 0.5) * ow, (y + 0.5) * oh)


def superview_distort(px, py, z, p):
    w, h = p["width"], p["height"]
    x = px / w - 0.5
    y = py / h - 0.5
    x *= 1.333333333
    ppx, ppy = x, y
    for _ in range(12):
        dx, dy = _superview(ppx, ppy)
        dfx, dfy = dx - x, dy - y
        if abs(dfx) < 1e-6 and abs(dfy) < 1e-6:
            break
        ppx -= dfx
        ppy -= dfy
    return ((ppx + 0.5) * w, (ppy + 0.5) * h)


MODELS = {
    "opencv_fisheye": (lambda pt, p: fisheye_undistort(pt[0], pt[1], p["k"]),
                       lambda x, y, z, p: fisheye_distort(x, y, z, p["k"])),
    "digital_stretch": (lambda pt, p: stretch_undistort(pt[0], pt[1], p),
                        lambda x, y, z, p: stretch_distort(x, y, z, p)),
    "gopro_superview": (lambda pt, p: superview_undistort(pt[0], pt[1], p),
                        lambda x, y, z, p: superview_distort(x, y, z, p)),
}


# ---------------- kernel param dict -----------------------------------------

def default_params(width, height, output_width, output_height):
    return dict(
        width=width, height=height, output_width=output_width, output_height=output_height,
        f=(1000.0, 1000.0), c=(width / 2.0, height / 2.0), k=[0.0] * 12,
        fov=1.0, r_limit=0.0, lens_correction_amount=1.0,
        input_horizontal_stretch=1.0, input_vertical_stretch=1.0,
        background=(0.0, 0.0, 0.0, 0.0), background_mode=0,
        background_margin=0.0, background_margin_feather=0.0,
        translation2d=(0.0, 0.0), translation3d=(0.0, 0.0, 0.0, 0.0),
        digital_lens_params=[0.0] * 16, light_refraction_coefficient=1.0,
        max_pixel_value=255.0, pixel_value_limit=255.0,
        ewa_coeffs_p=[0.0] * 4, ewa_coeffs_q=[0.0] * 4,
        distortion_model="opencv_fisheye", digital_lens=None,
        flags=0, plane_index=0, input_rotation=0.0,
        source_rect=(0, 0, width, height), output_rect=(0, 0, output_width, output_height),
        interpolation=2,
    )


def _oracle_mesh(uv, p, mesh):
    """Mesh + FPD stages (cpu_undistort.rs:169-214) via core/splines.py."""
    from gyroflow_tpu.core.splines import interpolate_mesh
    u, v = uv
    if mesh is not None and mesh[0] > 10.0:
        size = (mesh[3], mesh[4])
        ox, oy = mesh[5], mesh[6]
        cw, ch = mesh[7], mesh[8]
        inv = (p["flags"] & 128) == 128
        if inv:
            v = p["height"] - v
        mu = map_coord(u, 0.0, p["width"], ox, ox + cw)
        mv = map_coord(v, 0.0, p["height"], oy, oy + ch)
        np2 = interpolate_mesh(mu, mv, size, mesh)[0]
        u = map_coord(np2[0], ox, ox + cw, 0.0, p["width"])
        v = map_coord(np2[1], oy, oy + ch, 0.0, p["height"])
        if inv:
            v = p["height"] - v
    if mesh is not None and mesh[0] > 0.0 and mesh[int(mesh[0])] > 0.0:
        o = int(mesh[0])
        size = (mesh[3], mesh[4])
        ox, oy = mesh[5], mesh[6]
        cw, ch = mesh[7], mesh[8]
        stblz_grid = mesh[4] / 8.0
        inv = (p["flags"] & 128) == 128
        if inv:
            v = p["height"] - v
        u = map_coord(u, 0.0, p["width"], ox, ox + cw)
        v = map_coord(v, 0.0, p["height"], oy, oy + ch)
        idx = int(min(max(math.floor(v / stblz_grid), 0.0), 7.0))
        delta = v - stblz_grid * idx
        u -= mesh[o + 4 + idx * 2 + 0] * delta
        v -= mesh[o + 4 + idx * 2 + 1] * delta
        for j in range(idx):
            u -= mesh[o + 4 + j * 2 + 0] * stblz_grid
            v -= mesh[o + 4 + j * 2 + 1] * stblz_grid
        u = map_coord(u, ox, ox + cw, 0.0, p["width"])
        v = map_coord(v, oy, oy + ch, 0.0, p["height"])
        if inv:
            v = p["height"] - v
    return (u, v)


def rotate_and_distort(pos, idx, p, matrices, mesh=None):
    """cpu_undistort.rs:133-228."""
    m = matrices[idx]
    _x = pos[0] * m[0] + pos[1] * m[1] + m[2] + p["translation3d"][0]
    _y = pos[0] * m[3] + pos[1] * m[4] + m[5] + p["translation3d"][1]
    _w = pos[0] * m[6] + pos[1] * m[7] + m[8] + p["translation3d"][2]
    if _w <= 0.0:
        return None
    r_limit_sq = p["r_limit"] * p["r_limit"]
    if r_limit_sq > 0.0 and (_x * _x + _y * _y) > r_limit_sq * _w:
        return None
    lrc = p["light_refraction_coefficient"]
    if lrc != 1.0 and lrc > 0.0 and _w != 0.0:
        r = math.sqrt(_x * _x + _y * _y) / _w
        sin_theta_d = (r / math.sqrt(1.0 + r * r)) * lrc
        r_d = sin_theta_d / math.sqrt(1.0 - sin_theta_d * sin_theta_d)
        if r_d != 0.0:
            _w *= r / r_d
    distort = MODELS[p["distortion_model"]][1]
    u, v = distort(_x, _y, _w, p)
    u *= p["f"][0]
    v *= p["f"][1]
    if m[9] != 0 or m[10] != 0 or m[11] != 0 or m[12] != 0 or m[13] != 0:
        ang = m[11]
        ca, sa = math.cos(-ang), math.sin(-ang)
        u, v = (ca * u - sa * v - m[9] + m[12], sa * u + ca * v - m[10] + m[13])
    u += p["c"][0]
    v += p["c"][1]
    u, v = _oracle_mesh((u, v), p, mesh)
    if p["digital_lens"] is not None:
        u, v = MODELS[p["digital_lens"]][1](u, v, 1.0, p)
    if p["input_horizontal_stretch"] > 0.001:
        u /= p["input_horizontal_stretch"]
    if p["input_vertical_stretch"] > 0.001:
        v /= p["input_vertical_stretch"]
    return (u, v)


def rotate_point(pos, angle, origin, origin2):
    return (math.cos(angle) * (pos[0] - origin[0]) - math.sin(angle) * (pos[1] - origin[1]) + origin2[0],
            math.sin(angle) * (pos[0] - origin[0]) + math.cos(angle) * (pos[1] - origin[1]) + origin2[1])


def undistort_coord(x, y, p, matrices, out_c, out_f, mesh=None, rs_idx=None,
                    return_idx=False):
    """cpu_undistort.rs:421-517. `rs_idx` overrides the RS row select (the
    production kernels' default same-row EWA jacobian mode — see
    KernelConfig.ewa_ref_jac); `return_idx` appends the selected row."""
    orx, ory, orw, orh = p["output_rect"]
    x = map_coord(x, orx, orx + orw, 0.0, p["output_width"])
    y = map_coord(y, ory, ory + orh, 0.0, p["output_height"])
    x += p["translation2d"][0]
    y += p["translation2d"][1]

    if p["lens_correction_amount"] < 1.0:
        nx, ny = x, y
        if p["digital_lens"] is not None:
            fov = p["fov"]
            uz = ((nx - out_c[0]) * fov + out_c[0], (ny - out_c[1]) * fov + out_c[1])
            dpt = MODELS[p["digital_lens"]][0](uz, p)
            if dpt is not None:
                nx = (dpt[0] - out_c[0]) / fov + out_c[0]
                ny = (dpt[1] - out_c[1]) / fov + out_c[1]
        nx = (nx - out_c[0]) / out_f[0]
        ny = (ny - out_c[1]) / out_f[1]
        upt = MODELS[p["distortion_model"]][0]((nx, ny), p)
        if upt is not None:
            nx, ny = upt
        lrc = p["light_refraction_coefficient"]
        if lrc != 1.0 and lrc > 0.0:
            r = math.sqrt(nx * nx + ny * ny)
            if r != 0.0:
                sin_theta_d = (r / math.sqrt(1.0 + r * r)) / lrc
                r_d = sin_theta_d / math.sqrt(1.0 - sin_theta_d * sin_theta_d)
                factor = r_d / r
                nx *= factor
                ny *= factor
        nx = nx * out_f[0] + out_c[0]
        ny = ny * out_f[1] + out_c[1]
        a = p["lens_correction_amount"]
        x = nx * (1.0 - a) + x * a
        y = ny * (1.0 - a) + y * a

    matrix_count = len(matrices)
    if rs_idx is not None:
        idx = rs_idx
    else:
        horizontal = (p["flags"] & 16) != 0
        if horizontal:
            sy = min(max(int(round(x)), 0), p["width"])
        else:
            sy = min(max(int(round(y)), 0), p["height"])
        if matrix_count > 1:
            idx = matrix_count // 2
            pt = rotate_and_distort((x, y), idx, p, matrices, mesh)
            if pt is not None:
                if horizontal:
                    sy = min(max(int(round(pt[0])), 0), p["width"])
                else:
                    sy = min(max(int(round(pt[1])), 0), p["height"])
        idx = min(sy, matrix_count - 1)
    uv = rotate_and_distort((x, y), idx, p, matrices, mesh)
    if uv is None:
        return (None, idx) if return_idx else None
    u, v = uv

    frame_w, frame_h = float(p["width"]), float(p["height"])
    if p["input_rotation"] != 0.0:
        rotation = p["input_rotation"] * PI / 180.0
        fsz = rotate_point((frame_w, frame_h), rotation, (0.0, 0.0), (0.0, 0.0))
        fw, fh = round(abs(fsz[0])), round(abs(fsz[1]))
        u, v = rotate_point((u, v), rotation, (frame_w / 2, frame_h / 2), (fw / 2, fh / 2))
        frame_w, frame_h = fw, fh

    if p["background_mode"] == 1:
        u = min(max(u, 3.0), frame_w - 3.0)
        v = min(max(v, 3.0), frame_h - 3.0)
    elif p["background_mode"] == 2:
        rx, ry = round(u), round(v)
        w3, h3 = frame_w - 3.0, frame_h - 3.0
        if rx > w3: u = w3 - (rx - w3)
        if rx < 3.0: u = 3.0 + frame_w - (w3 + rx)
        if ry > h3: v = h3 - (ry - h3)
        if ry < 3.0: v = 3.0 + frame_h - (h3 + ry)
    if p["background_mode"] != 3:
        srx, sry, srw, srh = p["source_rect"]
        u = map_coord(u, 0.0, frame_w, srx, srx + srw)
        v = map_coord(v, 0.0, frame_h, sry, sry + srh)
    return ((u, v), idx) if return_idx else (u, v)


def _ewa_bc2(x, p):
    x = abs(x)
    x2 = x * x
    pw = p["ewa_coeffs_p"]
    qw = p["ewa_coeffs_q"]
    if x < 1.0:
        return pw[0] + pw[1] * x + pw[2] * x2 + pw[3] * x2 * x
    if x < 2.0:
        return qw[0] + qw[1] * x + qw[2] * x2 + qw[3] * x2 * x
    return 0.0


def sample_ewa_at(u, v, jac, img, p, bg):
    """EWA elliptical sampling (cpu_undistort.rs:329-369), literal port."""
    H, W, C = img.shape
    srx, sry, srw, srh = p["source_rect"]
    jx, jy, jz, jw = jac
    tx = 2.0 * max(abs(jx + jy), abs(jx - jy), 1.0)
    ty = 2.0 * max(abs(jz + jw), abs(jz - jw), 1.0)
    x0 = math.floor(u - tx)
    x1 = math.ceil(u + tx)
    y0 = math.floor(v - ty)
    y1 = math.ceil(v + ty)
    # clamped_ellipse
    f0 = abs(jx * jw - jy * jz)
    f = max(f0 * f0, 0.1)
    a = (jz * jz + jw * jw) / f
    b = -2.0 * (jx * jz + jy * jw) / f
    c = (jx * jx + jy * jy) / f
    vx, vy = c - a, -b
    lv = math.sqrt(vx * vx + vy * vy)
    v0 = vx / lv if lv > 0.01 else 1.0
    cc = math.sqrt(max(1.0 + v0, 0.0) / 2.0)
    s = math.sqrt(max(1.0 - v0, 0.0) / 2.0)
    a0 = a * cc * cc - b * cc * s + c * s * s
    c0 = a * s * s + b * cc * s + c * cc * cc
    bt1 = b * (cc * cc - s * s)
    bt2 = 2.0 * (a - c) * cc * s
    b0 = bt1 + bt2
    b0v2 = bt1 - bt2
    if abs(b0) > abs(b0v2):
        s = -s
        b0 = b0v2
    a0 = min(a0, 1.0)
    c0 = min(c0, 1.0)
    sn = -s
    abc = (a0 * cc * cc - b0 * cc * sn + c0 * sn * sn,
           2.0 * a0 * cc * sn + b0 * cc * cc - b0 * sn * sn - 2.0 * c0 * cc * sn,
           a0 * sn * sn + b0 * cc * sn + c0 * cc * cc)
    total = np.zeros(C, np.float64)
    sum_div = 0.0
    for in_y in range(y0, y1 + 1):
        fy = in_y - v
        fy2 = fy * abc[1]
        fy3 = fy * fy * abc[2]
        for in_x in range(x0, x1 + 1):
            fx = in_x - u
            dr = fx * fx * abc[0] + fx * fy2 + fy3
            k = _ewa_bc2(math.sqrt(max(dr, 0.0)), p)
            if k == 0.0:
                continue
            if sry <= in_y < sry + srh and srx <= in_x < srx + srw:
                px = img[in_y, in_x].astype(np.float64)
            else:
                px = bg
            total = total + k * px
            sum_div += k
    if sum_div != 0.0:
        total /= sum_div
    return np.minimum(total, p["pixel_value_limit"])


def sample_input_at(u, v, img, p, bg, jac=(1.0, 0.0, 0.0, 1.0)):
    if p["interpolation"] > 8:
        return sample_ewa_at(u, v, jac, img, p, bg)
    info = INTERP_INFO[p["interpolation"]]
    taps, ind, shift, offset = info["taps"], info["ind"], info["shift"], info["offset"]
    H, W, C = img.shape
    srx, sry, srw, srh = p["source_rect"]

    u = u - offset
    v = v - offset
    sx0 = int(round(u * 32.0))
    sy0 = int(round(v * 32.0))
    sx = sx0 >> 5
    sy = sy0 >> 5
    cx = COEFFS[ind + ((sx0 & 31) << shift):]
    cy = COEFFS[ind + ((sy0 & 31) << shift):]

    total = np.zeros(C, np.float64)
    for yp in range(taps):
        yy = sy + yp
        if sry <= yy < sry + srh:
            xsum = np.zeros(C, np.float64)
            for xp in range(taps):
                xx = sx + xp
                if srx <= xx < srx + srw:
                    px = img[yy, xx].astype(np.float64)
                else:
                    px = bg
                xsum += px * cx[xp]
            total += xsum * cy[yp]
        else:
            total += bg * cy[yp]
    return np.minimum(total, p["pixel_value_limit"])


def undistort_image(img, p, matrices, mesh=None):
    """cpu_undistort.rs:519-625 (scalar loops)."""
    H, W, C = img.shape
    ow, oh = p.get("out_size") or (p["output_width"], p["output_height"])
    out = np.zeros((oh, ow, C), np.float64)
    bg = np.asarray(p["background"], np.float64)[:C] * p["max_pixel_value"]

    factor = max(1.0 - p["lens_correction_amount"], 0.001)
    out_c = (p["output_width"] / 2.0, p["output_height"] / 2.0)
    out_f = (p["f"][0] / p["fov"] / factor, p["f"][1] / p["fov"] / factor)

    fill_bg = (p["flags"] & 4) != 0
    fix_range = (p["flags"] & 1) != 0
    is_y = p["plane_index"] == 0

    def remap_colorrange(px):
        # GPU-shader semantics (stabilize_spirv/src/drawing.rs:71-74): offset
        # scales with max_pixel_value and applies to all channels; the CPU
        # reference's flat +16 on 2 channels is its 8-bit-only variant
        px = px * (0.85882352 if is_y else 0.87843137)
        return px + (16.0 / 255.0) * p["max_pixel_value"]

    for y in range(oh):
        for x in range(ow):
            orx, ory, orw, orh = p["output_rect"]
            opx = map_coord(float(x), orx, orx + orw, 0.0, p["output_width"])
            opy = map_coord(float(y), ory, ory + orh, 0.0, p["output_height"])
            if not (0.0 <= opx and 0.0 <= opy and int(opx) < p["output_width"] and int(opy) < p["output_height"]):
                out[y, x] = bg
                continue
            pixel = bg.copy()
            if fill_bg:
                out[y, x] = bg
                continue
            uv, base_idx = undistort_coord(float(x), float(y), p, matrices,
                                           out_c, out_f, mesh, return_idx=True)
            if uv is not None:
                u, v = uv
                jac = (1.0, 0.0, 0.0, 1.0)
                if p["interpolation"] > 8:
                    # ewa_ref_jac=True: literal cpu_undistort.rs:566-571
                    # (each eval re-probes its own RS row). Default False:
                    # same-row jacobian, matching the production kernels
                    # (KernelConfig.ewa_ref_jac docstring).
                    eps = 0.01
                    ri = None if p.get("ewa_ref_jac", False) else base_idx
                    xyx = undistort_coord(float(x) + eps, float(y), p, matrices, out_c, out_f, mesh, rs_idx=ri) or (0.0, 0.0)
                    xyy = undistort_coord(float(x), float(y) + eps, p, matrices, out_c, out_f, mesh, rs_idx=ri) or (0.0, 0.0)
                    jac = ((xyx[0] - u) / eps, (xyy[0] - u) / eps,
                           (xyx[1] - v) / eps, (xyy[1] - v) / eps)
                if p["background_mode"] == 3:
                    fw, fh = float(p["width"]), float(p["height"])
                    widthf, heightf = fw - 1.0, fh - 1.0
                    feather = max(p["background_margin_feather"] * heightf, 0.0001)
                    p2u, p2v = u, v
                    alpha = 1.0
                    if u > widthf - feather or u < feather or v > heightf - feather or v < feather:
                        alpha = min(max(min(min(widthf - u, heightf - v), min(u, v)) / feather, 0.0), 1.0)
                        p2u = ((u / fw - 0.5) * (1.0 - p["background_margin"]) + 0.5) * fw
                        p2v = ((v / fh - 0.5) * (1.0 - p["background_margin"]) + 0.5) * fh
                    frame_w, frame_h = fw, fh
                    if p["input_rotation"] != 0.0:
                        rotation = p["input_rotation"] * PI / 180.0
                        fsz = rotate_point((fw, fh), rotation, (0, 0), (0, 0))
                        frame_w, frame_h = round(abs(fsz[0])), round(abs(fsz[1]))
                    srx, sry, srw, srh = p["source_rect"]
                    mu = map_coord(u, 0.0, frame_w, srx, srx + srw)
                    mv = map_coord(v, 0.0, frame_h, sry, sry + srh)
                    m2u = map_coord(p2u, 0.0, frame_w, srx, srx + srw)
                    m2v = map_coord(p2v, 0.0, frame_h, sry, sry + srh)
                    c1 = sample_input_at(mu, mv, img, p, bg, jac)
                    c2 = sample_input_at(m2u, m2v, img, p, bg, jac)
                    pixel = c1 * alpha + c2 * (1.0 - alpha)
                else:
                    pixel = sample_input_at(u, v, img, p, bg, jac)
            if fix_range:
                pixel = remap_colorrange(pixel)
            out[y, x] = pixel
    return out


def undistort_coord_map(p, matrices, mesh=None):
    """Map of uv coords (oh, ow, 2) with NaN where rejected (geometry compare)."""
    ow, oh = p.get("out_size") or (p["output_width"], p["output_height"])
    factor = max(1.0 - p["lens_correction_amount"], 0.001)
    out_c = (p["output_width"] / 2.0, p["output_height"] / 2.0)
    out_f = (p["f"][0] / p["fov"] / factor, p["f"][1] / p["fov"] / factor)
    out = np.full((oh, ow, 2), np.nan)
    for y in range(oh):
        for x in range(ow):
            uv = undistort_coord(float(x), float(y), p, matrices, out_c, out_f, mesh)
            if uv is not None:
                out[y, x] = uv
    return out

"""Pallas coords kernel: per-pixel rolling-shutter matrix projection on-chip.

The XLA path's cost is the per-pixel gather of 14-float rows from the (M, 14)
rolling-shutter matrix tensor (measured ~10 ms/frame @1080p — TPU gathers are
slow). Here each output tile DMAs only the small matrix-row window its pixels
reference, replaces the gather with a one-hot contraction E(win_m, P) against
the window, and then runs the full rotate_and_distort math
(remap.rotate_and_distort_core — distortion model, refraction, IBIS, digital
lens, stretch) on the VPU with zero HBM traffic.

Matrices are stored (Mpad, 16): the matrix index lives on the SUBLANE axis, so
window origins only need 8-row alignment (lane-axis DMA slices would force
128-alignment and ~2 extra K-passes of slack, measured on v5e). The one-hot
contraction runs as TWO bf16 MXU passes over a hi/lo split of the window —
E is an exact 0/1 matrix, so this reproduces the f32 row gather exactly
(the MXU's 1-pass default rounds matrix entries to bf16: ~10 px geometry
error at 4K, invisible to CPU-interpret goldens).
"""
from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import distortion_models as dm
from .kernel_params import HORIZONTAL_RS, KernelConfig, KernelDynamics

SUBLANE = 8
N_PARAMS = 48


def pack_params(dyn: KernelDynamics) -> jnp.ndarray:
    """Flatten the dynamic operands the kernel core reads into one SMEM row."""
    vals = [dyn.k, dyn.f, dyn.c, dyn.translation3d[:3],
            jnp.stack([dyn.r_limit, dyn.light_refraction_coefficient,
                       dyn.input_horizontal_stretch, dyn.input_vertical_stretch]),
            dyn.digital_lens_params]
    flat = jnp.concatenate([jnp.atleast_1d(v).astype(jnp.float32) for v in vals])
    return jnp.pad(flat, (0, N_PARAMS - flat.shape[0])).reshape(1, N_PARAMS)


def _unpack_params(g, cfg: KernelConfig):
    """Rebuild (dyn-like, LensParams) views over SMEM scalar reads."""
    k = [g(i) for i in range(12)]
    f = [g(12), g(13)]
    c = [g(14), g(15)]
    t3d = [g(16), g(17), g(18)]
    dlp = [g(23 + i) for i in range(16)]
    dyn_view = SimpleNamespace(
        f=f, c=c, translation3d=t3d, r_limit=g(19),
        light_refraction_coefficient=g(20),
        input_horizontal_stretch=g(21), input_vertical_stretch=g(22),
    )
    lp = dm.LensParams(
        k=k, digital_lens_params=dlp,
        width=float(cfg.width), height=float(cfg.height),
        output_width=float(cfg.output_width), output_height=float(cfg.output_height))
    return dyn_view, lp


GROUP = 8   # tiles per grid step (the (GROUP, P) block tiles natively)


def _coords_kernel(cfg: KernelConfig, win_m: int, G: int,
                   m0_ref,                    # scalar prefetch (ntiles,)
                   mats_ref,                  # ANY: (Mpad, 128)
                   x_ref, y_ref, idx_ref,     # VMEM (1, G, P)
                   par_ref,                   # SMEM (1, N_PARAMS)
                   u_out, v_out, valid_out,   # VMEM (1, G, P)
                   matwin_ref, sems):         # scratch (G, win_m, 128) + G sems
    from .remap import rotate_and_distort_core

    g = pl.program_id(0)

    def win_dma(j):
        m0 = pl.multiple_of(m0_ref[g * G + j], SUBLANE)
        return pltpu.make_async_copy(mats_ref.at[pl.ds(m0, win_m), :],
                                     matwin_ref.at[j], sems.at[j])

    for j in range(G):
        win_dma(j).start()

    P = x_ref.shape[-1]
    dyn_view, lp = _unpack_params(lambda i: par_ref[0, i], cfg)
    rid = jax.lax.broadcasted_iota(jnp.int32, (win_m, P), 0)

    # per-sub-tile matrix gathers (each against its own window), then ONE
    # rotate_and_distort_core evaluation on the whole (G, P) block — the
    # core's long dependency chain amortizes over 8 tiles of data
    m_rows = [[] for _ in range(14)]
    for j in range(G):
        idx = idx_ref[0, j:j + 1]
        m0 = pl.multiple_of(m0_ref[g * G + j], SUBLANE)
        win_dma(j).wait()
        idx_rel = idx - m0
        E = (rid == idx_rel).astype(jnp.float32)               # (win_m, P)
        # contract the sublane (matrix index) axis of both operands: exact
        # 0/1 one-hot x hi/lo window split -> f32-exact gather in 2 bf16
        # passes
        matwin = matwin_ref[j, :, :16]
        mat_hi = matwin.astype(jnp.bfloat16).astype(jnp.float32)
        mat_lo = matwin - mat_hi
        dn = (((0,), (0,)), ((), ()))                           # (16, P)
        m_mat = (jax.lax.dot_general(mat_hi, E, dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(mat_lo, E, dimension_numbers=dn,
                                       preferred_element_type=jnp.float32))
        for i in range(14):
            m_rows[i].append(m_mat[i:i + 1])

    m = [jnp.concatenate(rows, axis=0) for rows in m_rows]      # 14 x (G, P)
    u, v, valid = rotate_and_distort_core(x_ref[0], y_ref[0], m, cfg,
                                          dyn_view, lp)
    u_out[0] = u
    v_out[0] = v
    valid_out[0] = valid.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "win_m", "interpret"))
def _coords_call(cfg: KernelConfig, win_m: int, mats, x_t, y_t, idx_t, m0s, params,
                 interpret=False):
    """Grouped projection kernel: (ntiles, P) pixel rows -> (ntiles, P) u/v.

    G (usually 8) tiles per grid step so every operand crosses the Pallas
    boundary as a natural (8, 128)-tiled block; (1, P) rows force a
    degenerate T(1,128) layout on the producing XLA fusions."""
    ntiles, P = x_t.shape
    G = GROUP
    ng = pl.cdiv(ntiles, G)
    pad = ng * G - ntiles
    if pad:
        x_t = jnp.pad(x_t, ((0, pad), (0, 0)))
        y_t = jnp.pad(y_t, ((0, pad), (0, 0)))
        idx_t = jnp.pad(idx_t, ((0, pad), (0, 0)))
        m0s = jnp.pad(m0s, (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # mats
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, N_PARAMS), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, win_m, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    shape = jax.ShapeDtypeStruct((ng, G, P), jnp.float32)
    u, v, valid = pl.pallas_call(
        functools.partial(_coords_kernel, cfg, win_m, G),
        out_shape=(shape, shape, shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(m0s, mats, x_t.reshape(ng, G, P), y_t.reshape(ng, G, P),
      idx_t.reshape(ng, G, P), params)
    u = u.reshape(ng * G, P)
    v = v.reshape(ng * G, P)
    valid = valid.reshape(ng * G, P)
    if pad:
        u, v, valid = u[:ntiles], v[:ntiles], valid[:ntiles]
    return u, v, valid


def plan_matrix_windows(idx_t, win_m: int, matrix_count: int):
    """Per-tile matrix window origin from RS indices; returns (m0s, overflow).

    idx_t: (ntiles, P). Origins are 8-aligned (sublane-axis DMA slices on the
    (Mpad, 128) layout)."""
    imin = idx_t.min(axis=1)
    imax = idx_t.max(axis=1)
    m0 = (imin // SUBLANE) * SUBLANE
    m0 = jnp.clip(m0, 0, max(matrix_count - win_m, 0))
    overflow = ((imax - m0) >= win_m).any()
    return m0.astype(jnp.int32), overflow


def project_tiles(cfg: KernelConfig, dyn: KernelDynamics, matrices,
                  x_t, y_t, idx_t, win_m: int = 64):
    """Tile-flattened (ntiles, P) positions+indices -> (u, v, valid, overflow).

    Matrices ship as (Mpad, 128): matrix index on the sublane axis, so the
    per-tile window DMA is an 8-aligned sublane slice and the one-hot
    contraction runs at K=win_m (64 by default vs the 256 a lane-aligned
    window would force)."""
    matrix_count = matrices.shape[0]
    mpad = max(-(-matrix_count // SUBLANE) * SUBLANE, win_m)
    win_m = min(win_m, mpad)
    # lanes padded 16 -> 128 so the array gets the standard (8,128) f32
    # tiling (a 16-lane memref can't be dynamically sublane-sliced by Mosaic)
    mats = jnp.pad(matrices, ((0, mpad - matrix_count),
                              (0, 128 - matrices.shape[1])))   # (Mpad, 128)
    m0s, overflow = plan_matrix_windows(idx_t, win_m, mpad)
    params = pack_params(dyn)
    interpret = jax.default_backend() == "cpu"
    u_t, v_t, valid_t = _coords_call(cfg, win_m, mats, x_t, y_t, idx_t,
                                     m0s, params, interpret=interpret)
    return u_t, v_t, valid_t, overflow


# ---------------------------------------------------------------------------
# Self-contained coords kernel (round 4) — KEPT AS A DOCUMENTED NEGATIVE
# RESULT: measured +0.06 ms/frame vs the classic split at the bench geometry
# (experiments/perf_probe25.py) — the saved XLA fusions are fully offset by
# running the RS probe's second projection chain in-kernel, and the
# XLA-vs-Mosaic f32 contraction-order difference flips ~0.4% of pixels by
# one tap phase. Not wired into remap; retained for future Mosaic versions
# (a cheaper in-kernel probe would change the balance).
# ---------------------------------------------------------------------------
# The classic path above materializes x, y, idx as full (ntiles, P) HBM
# arrays in XLA (coords_pre fusion: the RS probe is a FULL projection per
# pixel), reduces idx per tile for the matrix-window origins (a second
# full-frame pass), and the kernel reads the three arrays back. Post
# band_mode those fusions are ~0.6 ms/frame of the 8.4 ms 4K step. Here the
# kernel instead:
#   * generates ox/oy arithmetically from the grid position (mirrors
#     pallas_sampler.tiled_grid bit-exactly),
#   * applies the static out_rect map + dynamic translation2d,
#   * runs the RS probe itself (center matrix from SMEM; the projection
#     chain is latency-hidden in this kernel — probe14 ablation),
#   * checks the matrix window EXACTLY and flags overflow for the ladder,
# so the only XLA-side work left is a 6-point-per-tile COARSE probe for the
# window origins (~1/250th of the full-frame pass). Gated off for
# lens_correction / mesh / digital-lens configs (those keep the classic
# path and its XLA pre-stage).

N_PARAMS_GEN = 64   # 39 classic + t2d(2) + center matrix(14) + oy0 = 56, padded


def pack_params_gen(dyn: KernelDynamics, matrices, oy0) -> jnp.ndarray:
    """Classic param row + translation2d + center matrix row + oy0."""
    center = matrices.shape[0] // 2
    vals = [dyn.k, dyn.f, dyn.c, dyn.translation3d[:3],
            jnp.stack([jnp.asarray(dyn.r_limit, jnp.float32),
                       jnp.asarray(dyn.light_refraction_coefficient, jnp.float32),
                       jnp.asarray(dyn.input_horizontal_stretch, jnp.float32),
                       jnp.asarray(dyn.input_vertical_stretch, jnp.float32)]),
            dyn.digital_lens_params,
            dyn.translation2d,
            matrices[center, :14],
            jnp.asarray(oy0, jnp.float32).reshape(1)]
    flat = jnp.concatenate([jnp.atleast_1d(v).astype(jnp.float32) for v in vals])
    return jnp.pad(flat, (0, N_PARAMS_GEN - flat.shape[0])).reshape(1, N_PARAMS_GEN)


def _coords_kernel_gen(cfg: KernelConfig, win_m: int, G: int,
                       tile_h: int, tile_w: int, nx: int, mcount: int,
                       pos_dx: float, pos_dy: float,
                       xmap: tuple, ymap: tuple,
                       m0_ref,                    # scalar prefetch (ntiles,)
                       mats_ref,                  # ANY: (Mpad, 128)
                       par_ref,                   # SMEM (1, N_PARAMS_GEN)
                       u_out, v_out, valid_out,   # VMEM (1, G, P)
                       ovf_out,                   # VMEM (1, G, 128)
                       matwin_ref, sems):
    from .remap import map_coord, rotate_and_distort_core

    g = pl.program_id(0)

    def win_dma(j):
        m0 = pl.multiple_of(m0_ref[g * G + j], SUBLANE)
        return pltpu.make_async_copy(mats_ref.at[pl.ds(m0, win_m), :],
                                     matwin_ref.at[j], sems.at[j])

    for j in range(G):
        win_dma(j).start()

    P = tile_h * tile_w
    dyn_view, lp = _unpack_params(lambda i: par_ref[0, i], cfg)
    t2d = (par_ref[0, 39], par_ref[0, 40])
    mc = [par_ref[0, 41 + i] for i in range(14)]
    oy0 = par_ref[0, 55]

    # ---- arithmetic ox/oy (mirrors pallas_sampler.tiled_grid) ----
    # float-reciprocal floor-div: operands < 2^23 and quotients never land
    # within 1e-2 of an integer boundary from below, so f32 floor is exact
    p_f = jax.lax.broadcasted_iota(jnp.int32, (G, P), 1).astype(jnp.float32)
    j_f = jax.lax.broadcasted_iota(jnp.int32, (G, P), 0).astype(jnp.float32)
    tile_f = jnp.float32(G) * jnp.float32(g) + j_f
    ty = jnp.floor((tile_f + 0.5) * jnp.float32(1.0 / nx))
    tx = tile_f - ty * jnp.float32(nx)
    r_f = jnp.floor((p_f + 0.5) * jnp.float32(1.0 / tile_w))
    c_f = p_f - r_f * jnp.float32(tile_w)
    ox = tx * jnp.float32(tile_w) + c_f
    oy = ty * jnp.float32(tile_h) + r_f + oy0

    # ---- coords_pre (plain form: out_rect map + translation2d) ----
    x = map_coord(ox + jnp.float32(pos_dx), xmap[0], xmap[1], xmap[2], xmap[3])
    y = map_coord(oy + jnp.float32(pos_dy), ymap[0], ymap[1], ymap[2], ymap[3])
    x = x + t2d[0]
    y = y + t2d[1]

    # ---- RS probe with the center matrix (cpu_undistort.rs:463-482) ----
    horizontal_rs = cfg.has(HORIZONTAL_RS)
    lim = jnp.float32(cfg.width if horizontal_rs else cfg.height)
    pu, pv, pvalid = rotate_and_distort_core(x, y, mc, cfg, dyn_view, lp)
    probe_axis = pu if horizontal_rs else pv
    fallback_axis = x if horizontal_rs else y
    sy = jnp.clip(jnp.rint(fallback_axis), 0.0, lim)
    sy = jnp.where(pvalid, jnp.clip(jnp.rint(probe_axis), 0.0, lim), sy)
    idx_f = jnp.minimum(sy, jnp.float32(mcount - 1))            # (G, P)

    rid = jax.lax.broadcasted_iota(jnp.int32, (win_m, P), 0).astype(jnp.float32)
    m_rows = [[] for _ in range(14)]
    ovf_rows = []
    for j in range(G):
        m0 = pl.multiple_of(m0_ref[g * G + j], SUBLANE)
        win_dma(j).wait()
        m0_f = jnp.float32(1.0) * m0
        idx_rel = idx_f[j:j + 1] - m0_f                          # (1, P)
        ok = (idx_rel >= 0.0) & (idx_rel < jnp.float32(win_m))
        # exact window check -> ladder retry; gather uses the clamped index
        # (flagged tiles' outputs are discarded by the caller)
        ovf_rows.append(jnp.full((1, 128), 1.0, jnp.float32) *
                        (1.0 - jnp.min(ok.astype(jnp.float32))))
        idx_rel = jnp.clip(idx_rel, 0.0, jnp.float32(win_m - 1))
        E = (rid == idx_rel).astype(jnp.float32)                 # (win_m, P)
        matwin = matwin_ref[j, :, :16]
        mat_hi = matwin.astype(jnp.bfloat16).astype(jnp.float32)
        mat_lo = matwin - mat_hi
        dn = (((0,), (0,)), ((), ()))                            # (16, P)
        m_mat = (jax.lax.dot_general(mat_hi, E, dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(mat_lo, E, dimension_numbers=dn,
                                       preferred_element_type=jnp.float32))
        for i in range(14):
            m_rows[i].append(m_mat[i:i + 1])

    m = [jnp.concatenate(rows, axis=0) for rows in m_rows]       # 14 x (G, P)
    u, v, valid = rotate_and_distort_core(x, y, m, cfg, dyn_view, lp)
    u_out[0] = u
    v_out[0] = v
    valid_out[0] = valid.astype(jnp.float32)
    ovf_out[0] = jnp.concatenate(ovf_rows, axis=0)               # (G, 128)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "win_m", "tile_h", "tile_w", "nx", "ntiles", "mcount",
    "pos_dx", "pos_dy", "xmap", "ymap", "interpret"))
def _coords_call_gen(cfg: KernelConfig, win_m: int, tile_h: int, tile_w: int,
                     nx: int, ntiles: int, mcount: int, pos_dx: float,
                     pos_dy: float, xmap: tuple, ymap: tuple, mats, m0s,
                     params, interpret=False):
    P = tile_h * tile_w
    G = GROUP
    ng = pl.cdiv(ntiles, G)
    pad = ng * G - ntiles
    if pad:
        m0s = jnp.pad(m0s, (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # mats
            pl.BlockSpec((1, N_PARAMS_GEN), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, 128), lambda i, *_: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, win_m, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    shape = jax.ShapeDtypeStruct((ng, G, P), jnp.float32)
    ovf_shape = jax.ShapeDtypeStruct((ng, G, 128), jnp.float32)
    u, v, valid, ovf = pl.pallas_call(
        functools.partial(_coords_kernel_gen, cfg, win_m, G, tile_h, tile_w,
                          nx, mcount, pos_dx, pos_dy, xmap, ymap),
        out_shape=(shape, shape, shape, ovf_shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(m0s, mats, params)
    u = u.reshape(ng * G, P)[:ntiles]
    v = v.reshape(ng * G, P)[:ntiles]
    valid = valid.reshape(ng * G, P)[:ntiles]
    ovf = ovf.reshape(ng * G, 128)[:ntiles]
    return u, v, valid, ovf


def project_tiles_gen(cfg: KernelConfig, dyn: KernelDynamics, matrices,
                      grid_ny: int, grid_nx: int, tile_h: int, tile_w: int,
                      oy0, out_c, out_f, pos_dx: float = 0.0,
                      pos_dy: float = 0.0, win_m: int = 64):
    """Self-contained RS coords: (u, v, valid, overflow) with NO full-frame
    XLA pre-stage. Matrix-window origins come from a 6-point-per-tile coarse
    probe (corners + mid-row edges); the kernel checks the window exactly and
    flags overflow so the caller's ladder stays sound."""
    from .remap import coords_pre

    matrix_count = matrices.shape[0]
    mpad = max(-(-matrix_count // SUBLANE) * SUBLANE, win_m)
    win_m = min(win_m, mpad)
    mats = jnp.pad(matrices, ((0, mpad - matrix_count),
                              (0, 128 - matrices.shape[1])))   # (Mpad, 128)

    ntiles = grid_ny * grid_nx
    t_ids = jnp.arange(ntiles, dtype=jnp.float32)[:, None]
    ty = jnp.floor((t_ids + 0.5) / grid_nx)
    tx = t_ids - ty * grid_nx
    x0 = tx * tile_w
    y0 = ty * tile_h
    cx = jnp.concatenate([x0, x0 + (tile_w - 1), x0, x0 + (tile_w - 1),
                          x0 + tile_w // 2, x0 + tile_w // 2], axis=1)
    cy = jnp.concatenate([y0, y0, y0 + (tile_h - 1), y0 + (tile_h - 1),
                          y0, y0 + (tile_h - 1)], axis=1) + jnp.asarray(
                              oy0, jnp.float32)
    pos_c = jnp.stack([cx + jnp.float32(pos_dx), cy + jnp.float32(pos_dy)],
                      axis=-1)                                  # (ntiles, 6, 2)
    _x, _y, idx_c, _probe = coords_pre(pos_c, matrices, cfg, dyn, out_c, out_f)
    # one-sublane margin below the coarse minimum covers interior wobble;
    # the kernel's exact check catches anything beyond it
    imin = jnp.maximum(idx_c.min(axis=1) - SUBLANE, 0)
    m0s = ((imin // SUBLANE) * SUBLANE).astype(jnp.int32)
    m0s = jnp.clip(m0s, 0, max(mpad - win_m, 0))

    params = pack_params_gen(dyn, matrices, oy0)
    interpret = jax.default_backend() == "cpu"
    u_t, v_t, valid_t, ovf = _coords_call_gen(
        cfg, win_m, tile_h, tile_w, grid_nx, ntiles, matrix_count,
        float(pos_dx), float(pos_dy), _xymap(cfg)[0], _xymap(cfg)[1],
        mats, m0s, params, interpret=interpret)
    return u_t, v_t, valid_t, (ovf > 0.5).any()


def _xymap(cfg: KernelConfig):
    """Static out_rect map_coord endpoints for x and y (coords_pre:197-198)."""
    orx, ory, orw, orh = cfg.out_rect
    return ((float(orx), float(orx + orw), 0.0, float(cfg.output_width)),
            (float(ory), float(ory + orh), 0.0, float(cfg.output_height)))

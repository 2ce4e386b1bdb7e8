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
from .kernel_params import KernelConfig, KernelDynamics

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

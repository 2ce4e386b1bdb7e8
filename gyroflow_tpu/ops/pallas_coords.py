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


def _coords_kernel(cfg: KernelConfig, win_m: int,
                   m0_ref,                    # scalar prefetch (ntiles,)
                   mats_ref,                  # ANY: (Mpad, 16)
                   x_ref, y_ref, idx_ref,     # VMEM (1, 1, P)
                   par_ref,                   # SMEM (1, N_PARAMS)
                   u_out, v_out, valid_out,   # VMEM (1, 1, P)
                   matwin_ref, sem):          # scratch (win_m, 128) + DMA sem
    from .remap import rotate_and_distort_core

    t = pl.program_id(0)
    m0 = pl.multiple_of(m0_ref[t], SUBLANE)
    cp = pltpu.make_async_copy(mats_ref.at[pl.ds(m0, win_m), :], matwin_ref, sem)
    cp.start()

    px = x_ref[0]
    py = y_ref[0]
    idx = idx_ref[0]
    P = px.shape[-1]

    dyn_view, lp = _unpack_params(lambda i: par_ref[0, i], cfg)

    cp.wait()
    idx_rel = idx - m0
    rid = jax.lax.broadcasted_iota(jnp.int32, (win_m, P), 0)
    E = (rid == idx_rel).astype(jnp.float32)                   # (win_m, P)
    # contract the sublane (matrix index) axis of both operands: exact 0/1
    # one-hot x hi/lo window split -> f32-exact gather in 2 bf16 passes
    matwin = matwin_ref[:, :16]
    mat_hi = matwin.astype(jnp.bfloat16).astype(jnp.float32)
    mat_lo = matwin - mat_hi
    dn = (((0,), (0,)), ((), ()))                               # (16, P)
    m_mat = (jax.lax.dot_general(mat_hi, E, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(mat_lo, E, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32))
    m = [m_mat[i:i + 1] for i in range(14)]

    u, v, valid = rotate_and_distort_core(px, py, m, cfg, dyn_view, lp)
    u_out[0] = u
    v_out[0] = v
    valid_out[0] = valid.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "win_m", "interpret"))
def _coords_call(cfg: KernelConfig, win_m: int, mats, x_t, y_t, idx_t, m0s, params,
                 interpret=False):
    ntiles, _, P = x_t.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # mats
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, N_PARAMS), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((win_m, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    shape = jax.ShapeDtypeStruct((ntiles, 1, P), jnp.float32)
    return pl.pallas_call(
        functools.partial(_coords_kernel, cfg, win_m),
        out_shape=(shape, shape, shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(m0s, mats, x_t, y_t, idx_t, params)


def plan_matrix_windows(idx_t, win_m: int, matrix_count: int):
    """Per-tile matrix window origin from RS indices; returns (m0s, overflow).

    Origins are 8-aligned (sublane-axis DMA slices on the (Mpad, 16) layout)."""
    imin = idx_t.min(axis=(1, 2))
    imax = idx_t.max(axis=(1, 2))
    m0 = (imin // SUBLANE) * SUBLANE
    m0 = jnp.clip(m0, 0, max(matrix_count - win_m, 0))
    overflow = ((imax - m0) >= win_m).any()
    return m0.astype(jnp.int32), overflow


def project_tiles(cfg: KernelConfig, dyn: KernelDynamics, matrices,
                  x_t, y_t, idx_t, win_m: int = 64):
    """Tile-flattened (ntiles,1,P) positions+indices -> (u, v, valid, overflow).

    Matrices ship as (Mpad, 16): matrix index on the sublane axis, so the
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

"""Pallas coords kernel: per-pixel rolling-shutter matrix projection on-chip.

The XLA path's cost is the per-pixel gather of 14-float rows from the (M, 14)
rolling-shutter matrix tensor (measured ~10 ms/frame @1080p — TPU gathers are
slow). Here each output tile DMAs only the small matrix-row window its pixels
reference (origins planned from the RS row-select indices), replaces the gather
with a one-hot matmul E(SrM,P) against the window, and then runs the full
rotate_and_distort math (remap.rotate_and_distort_core — distortion model,
refraction, IBIS, digital lens, stretch) on the VPU with zero HBM traffic.
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
                   mats_ref,                  # ANY: (M, 14)
                   x_ref, y_ref, idx_ref,     # VMEM (1, 1, P)
                   par_ref,                   # SMEM (1, N_PARAMS)
                   u_out, v_out, valid_out,   # VMEM (1, 1, P)
                   matwin_ref, sem):          # scratch (win_m, 14) + DMA sem
    from .remap import rotate_and_distort_core

    t = pl.program_id(0)
    m0 = pl.multiple_of(m0_ref[t], 128)
    # mats are stored TRANSPOSED (16, Mpad): matrix index on the lane axis, so
    # the one-hot contraction produces a (16, P) result instead of (128, P)
    cp = pltpu.make_async_copy(mats_ref.at[:, pl.ds(m0, win_m)], matwin_ref, sem)
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
    m_mat = jax.lax.dot_general(                                # (16, P)
        matwin_ref[:], E,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
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
            pltpu.VMEM((16, win_m), jnp.float32),
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

    Origins are 128-aligned (lane-axis DMA slices on the transposed layout)."""
    imin = idx_t.min(axis=(1, 2))
    imax = idx_t.max(axis=(1, 2))
    m0 = (imin // 128) * 128
    m0 = jnp.clip(m0, 0, max(matrix_count - win_m, 0))
    overflow = ((imax - m0) >= win_m).any()
    return m0.astype(jnp.int32), overflow


def project_tiles(cfg: KernelConfig, dyn: KernelDynamics, matrices,
                  x_t, y_t, idx_t, win_m: int = 256):
    """Tile-flattened (ntiles,1,P) positions+indices -> (u, v, valid, overflow).

    Matrices ship transposed (16, Mpad) so the per-tile window DMA slices the
    lane axis and the one-hot contraction yields a compact (16, P) result."""
    matrix_count = matrices.shape[0]
    mpad = max(-(-matrix_count // 128) * 128, win_m)
    win_m = min(win_m, mpad)
    matsT = jnp.pad(matrices, ((0, mpad - matrix_count),
                               (0, 16 - matrices.shape[1]))).T  # (16, Mpad)
    m0s, overflow = plan_matrix_windows(idx_t, win_m, mpad)
    params = pack_params(dyn)
    interpret = jax.default_backend() == "cpu"
    u_t, v_t, valid_t = _coords_call(cfg, win_m, matsT, x_t, y_t, idx_t,
                                     m0s, params, interpret=interpret)
    return u_t, v_t, valid_t, overflow

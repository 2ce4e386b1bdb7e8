"""Fused Pallas kernel: rolling-shutter projection + separable sampling.

STATUS: EXPERIMENT, NOT WIRED. Measured 13 fps vs the split kernels' 31 fps
on the 4K bench (v5e) — one mega-kernel step pipelines worse under Mosaic
than two small steps. Kept for round-2 investigation (correct per goldens).

Combines pallas_coords (one-hot matrix-window projection) and pallas_sampler
(window-DMA gather-free sampling) into ONE kernel step per tile — removing a
full kernel launch, the u/v/valid HBM roundtrip, and the second scalar-prefetch
pass. Image-window origins are planned from the CENTER-matrix probe that
coords_pre already computes for the RS row select (cpu_undistort.rs:465-482);
since per-row matrices can shift the true uv beyond the probe's bbox, the
kernel emits each tile's exact uv bbox and the caller re-checks coverage
post-hoc — an uncovered tile raises `overflow`, feeding the existing
retry-with-larger-window chain, so semantics stay exact.

Used for the hot path only: per-row RS + bilinear/bicubic/lanczos4 +
background modes 0-2. Mesh/EWA/feather run the split kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gyroflow_tpu.ops import pallas_coords as pc
from gyroflow_tpu.ops import pallas_sampler as ps
from gyroflow_tpu.ops.kernel_params import KernelConfig, KernelDynamics

LANE, SUBLANE = ps.LANE, ps.SUBLANE


def _fused_kernel(spec: ps.SamplerSpec, cfg: KernelConfig, win_m: int,
                  m0_ref, y0_ref, x0_ref,        # scalar prefetch (ntiles,)
                  mats_ref,                      # ANY: (16, Mpad) transposed
                  img_ref,                       # ANY: (C, H, W)
                  x_ref, y_ref, idx_ref,         # VMEM (1, 1, P)
                  par_ref,                       # SMEM (1, N_PARAMS)
                  bg_ref,                        # SMEM (1, C)
                  out_ref,                       # VMEM (1, C, P)
                  vout_ref,                      # VMEM (1, 1, P) valid
                  bbox_ref,                      # VMEM (1, 128): umin/umax/vmin/vmax
                  matwin_ref, win_ref, msem, isem):
    from .remap import coords_post_uv, rotate_and_distort_core

    Sr, Sc = spec.win_h, spec.win_w
    nchan = win_ref.shape[0]
    taps = spec.taps
    P = spec.tile_h * spec.tile_w
    srx, sry, srw, srh = spec.src_rect

    t = pl.program_id(0)
    m0 = pl.multiple_of(m0_ref[t], 128)
    y0 = pl.multiple_of(y0_ref[t], SUBLANE)
    x0 = pl.multiple_of(x0_ref[t], LANE)

    mcp = pltpu.make_async_copy(mats_ref.at[:, pl.ds(m0, win_m)], matwin_ref, msem)
    mcp.start()
    icp = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(y0, Sr), pl.ds(x0, Sc)], win_ref, isem)
    icp.start()

    px = x_ref[0]
    py = y_ref[0]
    idx = idx_ref[0]
    dyn_view, lp = pc._unpack_params(lambda i: par_ref[0, i], cfg)

    mcp.wait()
    rid = jax.lax.broadcasted_iota(jnp.int32, (win_m, P), 0)
    E = (rid == (idx - m0)).astype(jnp.float32)
    m_mat = jax.lax.dot_general(matwin_ref[:], E,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    m = [m_mat[i:i + 1] for i in range(14)]
    u, v, valid = rotate_and_distort_core(px, py, m, cfg, dyn_view, lp)
    u, v = coords_post_uv(u, v, cfg)
    u = jnp.clip(jnp.where(jnp.isfinite(u), u, 0.0), -32768.0, 32768.0)
    v = jnp.clip(jnp.where(jnp.isfinite(v), v, 0.0), -32768.0, 32768.0)

    # exact per-tile bbox (for the caller's post-hoc coverage check)
    big = jnp.float32(1e9)
    umin = jnp.min(jnp.where(valid, u, big))
    umax = jnp.max(jnp.where(valid, u, -big))
    vmin = jnp.min(jnp.where(valid, v, big))
    vmax = jnp.max(jnp.where(valid, v, -big))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    bbox_ref[0] = (jnp.where(lane == 0, umin, 0.0) +
                   jnp.where(lane == 1, umax, 0.0) +
                   jnp.where(lane == 2, vmin, 0.0) +
                   jnp.where(lane == 3, vmax, 0.0))

    # ---- sampling (same math as pallas_sampler._sampler_kernel) ----
    from .interpolation import INTER_BITS, INTER_TAB_SIZE
    uo = u - spec.offset
    vo = v - spec.offset
    sx0 = jnp.rint(uo * INTER_TAB_SIZE).astype(jnp.int32)
    sy0 = jnp.rint(vo * INTER_TAB_SIZE).astype(jnp.int32)
    fx = sx0 >> INTER_BITS
    fy = sy0 >> INTER_BITS
    phx = sx0 & (INTER_TAB_SIZE - 1)
    phy = sy0 & (INTER_TAB_SIZE - 1)
    wx = ps._WEIGHT_FNS[spec.interpolation](phx)
    wy = ps._WEIGHT_FNS[spec.interpolation](phy)
    fx_rel = fx - x0
    fy_rel = fy - y0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Sc, P), 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Sr, P), 0)

    def build_onehot(ids, rel, ws):
        n = len(ws)
        if n & (n - 1):
            acc = jnp.zeros(ids.shape, jnp.float32)
            for tt in range(n):
                acc = acc + jnp.where(ids == rel + tt, ws[tt], 0.0)
            return acc
        T = ids - rel
        level = list(ws)
        bit = 0
        while len(level) > 1:
            b = (T >> bit) & 1
            level = [jnp.where(b == 1, level[i + 1], level[i])
                     for i in range(0, len(level), 2)]
            bit += 1
        return jnp.where((T >= 0) & (T < n), level[0], 0.0)

    wxm, csum = [], jnp.zeros((1, P), jnp.float32)
    for tt in range(taps):
        ok = ((fx + tt >= srx) & (fx + tt < srx + srw)).astype(jnp.float32)
        w = wx[tt] * ok
        wxm.append(w)
        csum = csum + w
    C = build_onehot(col_ids, fx_rel, wxm)
    wym, rsum = [], jnp.zeros((1, P), jnp.float32)
    for tt in range(taps):
        ok = ((fy + tt >= sry) & (fy + tt < sry + srh)).astype(jnp.float32)
        w = wy[tt] * ok
        wym.append(w)
        rsum = rsum + w
    R = build_onehot(row_ids, fy_rel, wym)

    icp.wait()
    bg_weight = 1.0 - rsum * csum
    for ch in range(nchan):
        colmix = jnp.dot(win_ref[ch], C, preferred_element_type=jnp.float32)
        sampled = jnp.sum(R * colmix, axis=0, keepdims=True)
        out_ref[0, ch] = (sampled + bg_weight * bg_ref[0, ch])[0]
    vout_ref[0] = valid.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spec", "cfg", "win_m", "interpret"))
def _fused_call(spec: ps.SamplerSpec, cfg: KernelConfig, win_m: int,
                matsT, img, x_t, y_t, idx_t, m0s, y0s, x0s, params, bg,
                interpret=False):
    ntiles = x_t.shape[0]
    nchan = img.shape[0]
    P = spec.tile_h * spec.tile_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # matsT
            pl.BlockSpec(memory_space=pl.ANY),                 # img
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, pc.N_PARAMS), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nchan), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nchan, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, win_m), jnp.float32),
            pltpu.VMEM((nchan, spec.win_h, spec.win_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, spec, cfg, win_m),
        out_shape=(jax.ShapeDtypeStruct((ntiles, nchan, P), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, 1, P), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, 1, 128), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(m0s, y0s, x0s, matsT, img,
      x_t.reshape(ntiles, 1, P), y_t.reshape(ntiles, 1, P),
      idx_t.reshape(ntiles, 1, P), params, bg)


def _posthoc_overflow(spec: ps.SamplerSpec, bbox, y0s, x0s):
    """Recheck the planned windows against the kernels' exact uv bboxes."""
    bbox = bbox.reshape(bbox.shape[0], -1)
    umin, umax, vmin, vmax = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    any_valid = umin <= umax          # empty tiles emit (1e9, -1e9)
    off = spec.offset
    taps = spec.taps
    srx, sry, srw, srh = spec.src_rect
    xlast = jnp.minimum(jnp.floor(umax - off).astype(jnp.int32) + taps, srx + srw - 1)
    ylast = jnp.minimum(jnp.floor(vmax - off).astype(jnp.int32) + taps, sry + srh - 1)
    xfirst = jnp.maximum(jnp.floor(umin - off).astype(jnp.int32), srx)
    yfirst = jnp.maximum(jnp.floor(vmin - off).astype(jnp.int32), sry)
    over = (((xlast - x0s >= spec.win_w) | (ylast - y0s >= spec.win_h) |
             (xfirst < x0s) | (yfirst < y0s)) &
            (xlast >= xfirst) & (ylast >= yfirst) & any_valid)
    return over.any()


def remap_fused(img, matsT_padded, matrix_count, x_t, y_t, idx_t,
                probe_u, probe_v, probe_valid,
                spec: ps.SamplerSpec, cfg: KernelConfig, dyn: KernelDynamics,
                bg_vec, win_m: int = 256):
    """Run the fused projection+sampling kernel over flat-tiled coords.

    probe_u/v: center-matrix uv (already coords_post-mapped) used to plan the
    image windows; coverage is re-verified against the kernels' exact bboxes.
    Returns (out_t (ntiles,C,P), valid_t (ntiles,P) bool, overflow)."""
    imgs = ps._pad_imgs(spec, img)
    m0s, m_over = pc.plan_matrix_windows(
        idx_t.reshape(idx_t.shape[0], 1, -1), win_m, matsT_padded.shape[1])
    y0s, x0s, _xo, _yo, _ = ps.plan_windows_t(spec, probe_u, probe_v, probe_valid)
    params = pc.pack_params(dyn)
    bg = jnp.asarray(bg_vec, jnp.float32).reshape(1, imgs.shape[0])
    interpret = jax.default_backend() == "cpu"
    out_t, valid_t, bbox = _fused_call(spec, cfg, win_m, matsT_padded, imgs,
                                       x_t, y_t, idx_t, m0s, y0s, x0s,
                                       params, bg, interpret=interpret)
    overflow = m_over | _posthoc_overflow(spec, bbox, x0s=x0s, y0s=y0s)
    return out_t, valid_t.reshape(valid_t.shape[0], -1) > 0.5, overflow

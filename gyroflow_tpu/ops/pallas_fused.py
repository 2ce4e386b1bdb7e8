"""Fused RS-projection + sampling Pallas kernel (round 4).

The round-3 device trace shows the separate coords kernel costs ~1.9 ms/frame
4K Y + 0.5 ms UV of almost pure per-grid-step pipeline latency (the r2 probe
measured an EMPTY kernel with the same grid at 1.9 ms, and "matrix-only" ==
"full math" inside it), plus a u/v HBM round trip. This kernel runs the
rolling-shutter matrix gather + rotate_and_distort projection AND the
separable window sampling in ONE grid step per tile group, removing a whole
kernel pipeline per plane.

The catch: the sampler's image-window DMA origins are scalar-prefetch
operands — known BEFORE the kernel runs — but the exact per-pixel source
coordinates are now computed INSIDE it. Planning therefore uses
  * the dense CENTER-matrix probe that coords_pre already computes for the
    RS row select (gather-free XLA, cpu_undistort.rs:465-482) for per-tile
    uv bboxes, plus
  * a sparse per-tile bound on the |row-matrix − center-matrix| projection
    delta (probe points through a row-downsampled matrix table, gathered by
    an exact hi/lo one-hot matmul), plus a small fixed allowance.
Correctness does NOT rest on the plan: the kernel re-checks every valid
pixel's in-rect taps against its tile's DMA'd band and reports a per-tile
overflow flag; an overflowing plan feeds the existing window ladder /
XLA-fallback chain, so results stay bit-exact vs the split-kernel path.

An earlier ungrouped fused kernel (r2, experiments/pallas_fused.py) measured
13 vs 31 fps — per-tile grid steps forced degenerate (1, P) layouts on every
operand. This one keeps the modern structure: G=8 tile groups with natural
(8, 128)-tiled (G, P) blocks, rolled compute windows, mod-8 band builds.

Reference: the per-pixel pipeline spec is stabilize_spirv/src/stabilize.rs
58-141 == cpu_undistort.rs:421-625 (SURVEY §8.1); this kernel fuses steps
5-8 of that pipeline with the sampling step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_coords as pc
from . import pallas_sampler as ps
from .kernel_params import KernelConfig, KernelDynamics

LANE, SUBLANE = ps.LANE, ps.SUBLANE
PVL_SLOT = 39    # pixel_value_limit's slot in the packed params row


def _guard_uv_kernel(a):
    """In-kernel equivalent of sampler _guard_uv: NaN/Inf -> 0, clip ±32768."""
    bad = (a != a) | (a < -3.0e38) | (a > 3.0e38)
    return jnp.where(bad, 0.0, jnp.clip(a, -32768.0, 32768.0))


def _fused_kernel(spec: ps.SamplerSpec, cfg: KernelConfig, win_m: int, G: int,
                  ntiles: int, padded: bool,
                  m0_ref, y0_ref, x0_ref,      # scalar prefetch (ntiles,)
                  xoff_ref, yoff_ref,          # scalar prefetch (ntiles,)
                  mats_ref,                    # ANY (HBM): (Mpad, 128)
                  img_ref,                     # ANY (HBM): (C, H, W)
                  x_ref, y_ref, idx_ref,       # VMEM (1, G, P)
                  par_ref,                     # SMEM (1, N_PARAMS)
                  bg_ref,                      # SMEM (1, C)
                  out_ref,                     # VMEM (C, 1, G, P)
                  ov_ref,                      # VMEM (1, G) f32 overflow flags
                  matwin_ref, win_ref,         # scratch (G, win_m, 128) + (G, C, Sr, Sc)
                  msems, isems):
    from .remap import coords_post_uv, rotate_and_distort_core

    Sr, Sc = spec.win_h, spec.win_w
    Kw, Kh = spec.kw, spec.kh
    nchan = win_ref.shape[1]
    taps = spec.taps
    P = spec.tile_h * spec.tile_w
    srx, sry, srw, srh = spec.src_rect

    g = pl.program_id(0)

    def mat_dma(j):
        m0 = pl.multiple_of(m0_ref[g * G + j], SUBLANE)
        return pltpu.make_async_copy(mats_ref.at[pl.ds(m0, win_m), :],
                                     matwin_ref.at[j], msems.at[j])

    def img_dma(j):
        tile = g * G + j
        ty0 = pl.multiple_of(y0_ref[tile], SUBLANE)
        tx0 = pl.multiple_of(x0_ref[tile], LANE)
        return pltpu.make_async_copy(
            img_ref.at[:, pl.ds(ty0, Sr), pl.ds(tx0, Sc)],
            win_ref.at[j], isems.at[j])

    for j in range(G):
        mat_dma(j).start()
        img_dma(j).start()

    # ---- projection: one-hot matrix gather + rotate_and_distort on (G, P) ----
    dyn_view, lp = pc._unpack_params(lambda i: par_ref[0, i], cfg)
    rid = jax.lax.broadcasted_iota(jnp.int32, (win_m, P), 0)
    m_rows = [[] for _ in range(14)]
    for j in range(G):
        idx = idx_ref[0, j:j + 1]
        m0 = pl.multiple_of(m0_ref[g * G + j], SUBLANE)
        mat_dma(j).wait()
        idx_rel = idx - m0
        E = (rid == idx_rel).astype(jnp.float32)               # (win_m, P)
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
    u, v = coords_post_uv(u, v, cfg)
    u = _guard_uv_kernel(u)
    v = _guard_uv_kernel(v)

    # padded output pixels (tile grid beyond out_width/height) must not
    # sample or flag overflow; static no-op at exactly-tiled geometries
    ny, nx = spec.grid
    if ny * spec.tile_h > spec.out_height or nx * spec.tile_w > spec.out_width:
        t_ids = g * G + jax.lax.broadcasted_iota(jnp.int32, (G, P), 0)
        p_ids = jax.lax.broadcasted_iota(jnp.int32, (G, P), 1)
        oy = (t_ids // nx) * spec.tile_h + p_ids // spec.tile_w
        ox = (t_ids % nx) * spec.tile_w + p_ids % spec.tile_w
        valid = valid & (ox < spec.out_width) & (oy < spec.out_height)

    # ---- sampling (same math as _sampler_kernel) ----
    fx, fy, wxm, wym, bg_weight = ps.prep_taps(spec, u, v)

    pvl = par_ref[0, PVL_SLOT]
    sampled_rows = [[] for _ in range(nchan)]
    ov_rows = []
    for j in range(G):
        tile = g * G + j
        y0 = pl.multiple_of(y0_ref[tile], SUBLANE)
        x0 = pl.multiple_of(x0_ref[tile], LANE)
        xoff = pl.multiple_of(xoff_ref[tile], SUBLANE)
        yoff = yoff_ref[tile]
        fxj = fx[j:j + 1]
        fyj = fy[j:j + 1]
        fx_rel = fxj - x0 - xoff
        fy_rel = fyj - y0 - yoff
        wxm_j = [w[j:j + 1] for w in wxm]
        wym_j = [w[j:j + 1] for w in wym]

        # exact per-pixel overflow: every IN-RECT tap of a valid pixel must
        # lie inside this tile's rolled band AND inside the DMA'd window
        # (a band past the window end would WRAP under pltpu.roll). Matches
        # plan_windows_t's tile-level formula, evaluated on the kernel's own
        # quantized tap anchors.
        xfirst = jnp.maximum(fxj, srx)
        xlast = jnp.minimum(fxj + (taps - 1), srx + srw - 1)
        yfirst = jnp.maximum(fyj, sry)
        ylast = jnp.minimum(fyj + (taps - 1), sry + srh - 1)
        has_taps = (xlast >= xfirst) & (ylast >= yfirst)
        ovx = ((xfirst - x0 - xoff < 0) | (xlast - x0 - xoff >= Kw) |
               (xlast - x0 >= Sc) | (xfirst - x0 < 0))
        ovy = ((yfirst - y0 - yoff < 0) | (ylast - y0 - yoff >= Kh) |
               (ylast - y0 >= Sr) | (yfirst - y0 < 0))
        ov_px = valid[j:j + 1] & has_taps & (ovx | ovy)
        if padded:
            # tail group: G-padding tiles carry garbage coords; never flag
            ov_px = ov_px & (tile < ntiles)
        ov_rows.append(ov_px.astype(jnp.float32))

        img_dma(j).wait()
        rows = ps.tile_sample(spec, win_ref[j], fx_rel, fy_rel, wxm_j, wym_j,
                              xoff, yoff)
        for ch in range(nchan):
            sampled_rows[ch].append(rows[ch])

    # background blend + validity + pixel limit, all in-kernel on (G, P)
    for ch in range(nchan):
        s_all = jnp.concatenate(sampled_rows[ch], axis=0)     # (G, P)
        px = s_all + bg_weight * bg_ref[0, ch]
        px = jnp.minimum(px, pvl)
        out_ref[ch, 0] = jnp.where(valid, px, bg_ref[0, ch])

    # only the global any() is consumed — one scalar per grid step, stored
    # broadcast across a full (8, 128) tile (Mosaic block-shape requirement)
    ov_all = jnp.concatenate(ov_rows, axis=0)                 # (G, P)
    ov_ref[0] = jnp.broadcast_to(jnp.max(ov_all), (8, 128))


@functools.partial(jax.jit, static_argnames=("spec", "cfg", "win_m", "interpret"))
def _fused_call(spec: ps.SamplerSpec, cfg: KernelConfig, win_m: int,
                mats, img, x_t, y_t, idx_t, m0s, y0s, x0s, xoffs, yoffs,
                params, bg, interpret=False):
    """Run the fused kernel. Returns ((C, ntiles, P), overflow_bool)."""
    ntiles = x_t.shape[0]
    nchan = img.shape[0]
    P = spec.tile_h * spec.tile_w
    G = ps._group_size(spec, nchan)
    ng = pl.cdiv(ntiles, G)
    pad = ng * G - ntiles
    if pad:
        x_t = jnp.pad(x_t, ((0, pad), (0, 0)))
        y_t = jnp.pad(y_t, ((0, pad), (0, 0)))
        idx_t = jnp.pad(idx_t, ((0, pad), (0, 0)))
        m0s = jnp.pad(m0s, (0, pad))
        y0s = jnp.pad(y0s, (0, pad))
        x0s = jnp.pad(x0s, (0, pad))
        xoffs = jnp.pad(xoffs, (0, pad))
        yoffs = jnp.pad(yoffs, (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # mats
            pl.BlockSpec(memory_space=pl.ANY),                 # img
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, pc.N_PARAMS), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nchan), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((nchan, 1, G, P), lambda i, *_: (0, i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, win_m, 128), jnp.float32),
            pltpu.VMEM((G, nchan, spec.win_h, spec.win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    out, ov = pl.pallas_call(
        functools.partial(_fused_kernel, spec, cfg, win_m, G, ntiles, pad > 0),
        out_shape=(jax.ShapeDtypeStruct((nchan, ng, G, P), jnp.float32),
                   jax.ShapeDtypeStruct((ng, 8, 128), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(m0s, y0s, x0s, xoffs, yoffs, mats, img,
      x_t.reshape(ng, G, P), y_t.reshape(ng, G, P), idx_t.reshape(ng, G, P),
      params, bg)
    out = out.reshape(nchan, ng * G, P)
    if pad:
        out = out[:, :ntiles]
    return out, jnp.max(ov[:, 0, 0]) > 0.5


def _window_origins(spec: ps.SamplerSpec, umin, umax, vmin, vmax):
    """plan_windows_t's origin math from per-tile uv bounds (no overflow —
    the kernel reports exact per-tile overflow itself).

    Unlike plan_windows_t there is no extra -1 quantization guard: the
    plan allowance (>= 1 px, vs the 1/32 px rint-vs-floor effect) subsumes
    it, and every guard pixel costs band budget on BOTH sides."""
    off = spec.offset
    xf = jnp.floor(umin - off).astype(jnp.int32) & ~(SUBLANE - 1)
    x0 = xf & ~(LANE - 1)
    yf = jnp.floor(vmin - off).astype(jnp.int32)
    y0 = yf & ~(SUBLANE - 1)
    x0 = jnp.clip(x0, 0, max(spec.width - spec.win_w, 0))
    y0 = jnp.clip(y0, 0, max(spec.height - spec.win_h, 0))
    xf = jnp.clip(xf, x0, x0 + spec.win_w - SUBLANE)
    xoff = (xf - x0) if spec.kw < spec.win_w else jnp.zeros_like(x0)
    if spec.win_r and spec.win_r < spec.win_h:
        yf = jnp.clip(yf, y0, y0 + spec.win_h - spec.win_r)
        yoff = yf - y0
    else:
        yoff = jnp.zeros_like(y0)
    return y0, x0, xoff, yoff


# probe pixel offsets within a tile: 3 rows x 3 cols of the tile grid
_PROBE_ROWS = (0.0, 0.5, 1.0)
_PROBE_COLS = (0.0, 0.25, 0.5, 0.75, 1.0)
# fixed allowance on the sparse row-vs-center delta bound: covers probe
# sparsity + the row-downsampled matrix quantization (~stride/2 rows) +
# second-order variation between probe points. Overshooting only risks a
# one-rung-larger window; undershooting only costs a ladder retry.
_PLAN_ALLOWANCE = 1.0
_MDS = 128       # downsampled matrix rows used for the sparse row probe


def _probe_cols(spec: ps.SamplerSpec):
    """Static flat-P indices of the probe points inside a tile."""
    TH, TW = spec.tile_h, spec.tile_w
    cols = []
    for fr in _PROBE_ROWS:
        r = int(round(fr * (TH - 1)))
        for fc in _PROBE_COLS:
            c = int(round(fc * (TW - 1)))
            cols.append(r * TW + c)
    return tuple(sorted(set(cols)))


def plan_fused(spec: ps.SamplerSpec, cfg: KernelConfig, dyn: KernelDynamics,
               matrices, x_t, y_t, idx_t, probe, pad_ok):
    """Image-window plan for the fused kernel (XLA, gather-free).

    probe: (pu, pv, pvalid) — the dense center-matrix projection computed by
    coords_pre for the RS row select. Returns (y0s, x0s, xoffs, yoffs)."""
    from .remap import _lens_params, coords_post_uv, rotate_and_distort_core

    pu, pv = coords_post_uv(probe[0], probe[1], cfg)
    pvalid = probe[2] & pad_ok
    pu = jnp.clip(jnp.where(jnp.isfinite(pu), pu, 0.0), -32768.0, 32768.0)
    pv = jnp.clip(jnp.where(jnp.isfinite(pv), pv, 0.0), -32768.0, 32768.0)

    # sparse row-matrix probe through a downsampled matrix table
    cols = list(_probe_cols(spec))
    xs = x_t[:, cols]
    ys = y_t[:, cols]
    idxs = idx_t[:, cols]
    mcount = matrices.shape[0]
    stride = max(1, -(-mcount // _MDS))
    mats_ds = matrices[::stride][:, :14]                     # (Mds, 14)
    mds = mats_ds.shape[0]
    iq = jnp.clip(jnp.rint(idxs.astype(jnp.float32) / stride).astype(jnp.int32),
                  0, mds - 1)
    onehot = (iq[..., None] == jnp.arange(mds, dtype=jnp.int32)).astype(jnp.float32)
    # precision=HIGHEST: under jit XLA recombines a hi/lo split pair
    # dot(E,hi)+dot(E,lo) back into dot(E,hi+lo) — ONE default-precision
    # bf16 pass whose ±0.4% matrix error turns into ±5-10 px of planned uv
    # (measured: thousands of mis-banded tiles). The probe matmul is tiny,
    # so full f32 emulation costs nothing.
    msel = jnp.einsum("tkm,mi->tki", onehot, mats_ds,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    m = [msel[..., i] for i in range(14)]
    ur, vr, rvalid = rotate_and_distort_core(xs, ys, m, cfg, dyn,
                                             _lens_params(cfg, dyn))
    ur, vr = coords_post_uv(ur, vr, cfg)
    ur = jnp.clip(jnp.where(jnp.isfinite(ur), ur, 0.0), -32768.0, 32768.0)
    vr = jnp.clip(jnp.where(jnp.isfinite(vr), vr, 0.0), -32768.0, 32768.0)

    # SIGNED per-tile delta bounds: the row-matrix vs center-matrix
    # difference is a nearly-constant BIAS within a tile (rows far from the
    # frame center project tens of px away under strong RS), so the bbox is
    # SHIFTED by [min_delta, max_delta] rather than inflated by max|delta| —
    # the band stays as tight as the split path's exact plan up to the
    # within-tile variation of the bias plus the allowance.
    both = rvalid & pvalid[:, cols]
    big = jnp.float32(1e9)
    du_min = jnp.min(jnp.where(both, ur - pu[:, cols], big), axis=1)
    du_max = jnp.max(jnp.where(both, ur - pu[:, cols], -big), axis=1)
    dv_min = jnp.min(jnp.where(both, vr - pv[:, cols], big), axis=1)
    dv_max = jnp.max(jnp.where(both, vr - pv[:, cols], -big), axis=1)
    any_both = both.any(axis=1)
    du_min = jnp.where(any_both, du_min, 0.0) - _PLAN_ALLOWANCE
    du_max = jnp.where(any_both, du_max, 0.0) + _PLAN_ALLOWANCE
    dv_min = jnp.where(any_both, dv_min, 0.0) - _PLAN_ALLOWANCE
    dv_max = jnp.where(any_both, dv_max, 0.0) + _PLAN_ALLOWANCE

    umin = jnp.min(jnp.where(pvalid, pu, big), axis=1)
    umax = jnp.max(jnp.where(pvalid, pu, -big), axis=1)
    vmin = jnp.min(jnp.where(pvalid, pv, big), axis=1)
    vmax = jnp.max(jnp.where(pvalid, pv, -big), axis=1)
    any_valid = pvalid.any(axis=1)
    umin = jnp.where(any_valid, umin + du_min, 0.0)
    umax = jnp.where(any_valid, umax + du_max, 0.0)
    vmin = jnp.where(any_valid, vmin + dv_min, 0.0)
    vmax = jnp.where(any_valid, vmax + dv_max, 0.0)
    return _window_origins(spec, umin, umax, vmin, vmax)


def remap_fused(spec: ps.SamplerSpec, cfg: KernelConfig, dyn: KernelDynamics,
                imgs, matrices, x_t, y_t, idx_t, probe, pad_ok, bg_vec,
                win_m: int):
    """Full fused path: plan + kernel. imgs (C, H, W); x/y/idx (ntiles, P).

    Returns ((C, ntiles, P) final pixels — background-blended, limit-clamped,
    validity-masked — and an overflow bool)."""
    nchan = imgs.shape[0]
    imgs = ps._pad_imgs(spec, imgs)

    y0s, x0s, xoffs, yoffs = plan_fused(spec, cfg, dyn, matrices,
                                        x_t, y_t, idx_t, probe, pad_ok)

    mcount = matrices.shape[0]
    mpad = max(-(-mcount // SUBLANE) * SUBLANE, win_m)
    win_m = min(win_m, mpad)
    mats = jnp.pad(matrices, ((0, mpad - mcount), (0, 128 - matrices.shape[1])))
    m0s, m_overflow = pc.plan_matrix_windows(idx_t, win_m, mpad)

    params = pc.pack_params(dyn)
    params = params.at[0, PVL_SLOT].set(
        jnp.asarray(dyn.pixel_value_limit, jnp.float32).reshape(()))
    bg = jnp.asarray(bg_vec, jnp.float32).reshape(1, nchan)
    interpret = jax.default_backend() == "cpu"
    out_t, s_overflow = _fused_call(spec, cfg, win_m, mats, imgs,
                                    x_t, y_t, idx_t, m0s, y0s, x0s, xoffs,
                                    yoffs, params, bg, interpret=interpret)
    return out_t, m_overflow | s_overflow

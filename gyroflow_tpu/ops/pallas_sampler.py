"""Gather-free Pallas TPU sampling kernel for the remap.

TPUs have no efficient arbitrary gather (measured: XLA gather ~10-20 ns/tap ->
1.3 s/frame for 1080p lanczos4). This kernel removes gathers entirely:

For each output tile (TH x TW pixels):
  1. DMA a source window (Sr x Sc) from HBM into VMEM. The window origin is
     data-dependent (computed host/XLA-side from the uv map's per-tile bbox)
     and delivered via PrefetchScalarGridSpec scalar-prefetch arrays.
  2. Build the separable tap-weight matrices arithmetically:
       C[p, c] = sum_t wx_t(p) * [c == fx(p) + t] * colok_t(p)   (P x Sc)
       R[p, r] = sum_t wy_t(p) * [r == fy(p) + t] * rowok_t(p)   (P x Sr)
     using the same 32-phase fixed-point quantization as the reference LUTs
     (cpu_undistort.rs:11-75) — weights are computed from the defining formulas
     at the quantized phase, so values match the tables to f32 rounding.
  3. colmix = C @ win^T on the MXU (each pixel's row-strip of column-mixed
     values), then out[p] = sum_r R[p,r] * colmix[p,r] on the VPU.
  4. Out-of-source-rect taps contribute background: since sum(w) == 1 per axis,
     bg weight = 1 - rowsum_in(p) * colsum_in(p) (mask separability), matching
     the reference's per-tap bg reads exactly.

This turns a memory-latency-bound gather loop into MXU matmuls + VPU masks —
the TPU-native formulation of texture sampling.
"""
from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interpolation import INTER_BITS, INTER_TAB_SIZE, INTERP_INFO

LANE = 128
SUBLANE = 8


class SamplerSpec(NamedTuple):
    """Static geometry of the sampling kernel (one compiled kernel per value)."""
    height: int            # source plane H
    width: int             # source plane W
    out_height: int
    out_width: int
    interpolation: int     # 2 | 4 | 8
    tile_h: int = 8
    tile_w: int = 128
    win_h: int = 64
    win_w: int = 512
    source_rect: tuple = None  # (x, y, w, h)
    win_k: int = 0         # rolled compute width (0 = full win_w, no roll)
    exact8: bool = False   # content is exactly bf16-representable (uint8
                           # codes): the colmix needs no hi/lo pixel split
    win_r: int = 0         # rolled compute height (0 = full win_h): the DMA
                           # stays 8-row-aligned but the kernel rolls each
                           # tile's exact row band to sublane 0 and mixes only
                           # win_r rows — the colmix matmul M-dim drops by the
                           # up-to-7-row alignment slack
    band_mode: int = 1     # 8-tap band materialization: 1 = mod-8 single-
                           # compare form (build_onehot8_mod; 13.1 -> 9.7
                           # ms/frame 4K Y on v5e, bit-exact), 0 = blocked
                           # two-select form (kept for A/B probes)
    ewa_cap: int = 4       # EWA X stencil radius: taps_x = 2*cap + 2. The
                           # reference bbox is 2*max(|jac row|, 1)
                           # (cpu_undistort.rs:272-277) — dynamic, unbounded.
                           # Here the radius is STATIC per compiled kernel;
                           # the caller computes the needed radius (min of
                           # bbox and dr<=4 ellipse support) from the jac map
                           # in XLA and escalates through the window ladder
                           # when it exceeds the rung's cap. The X radius is
                           # ~2 for almost all real content (the tap LOOP
                           # iterates over x taps: 10 -> 6-8 iterations); the
                           # Y radius spikes to ~5-9 on per-row-RS content
                           # because the reference's finite-difference
                           # jacobian (undistort_point(pos±eps)) crosses RS
                           # matrix-row boundaries, so Y keeps its own cap.
    ewa_cap_y: int = 4     # EWA Y stencil radius: taps_y = 2*cap_y + 2
                           # (typ-space rows). Cap 4 is the legacy fixed
                           # stencil with NO escalation check (radius > 4
                           # truncates taps in the bc2 tail — documented
                           # deviation, STATUS.md).

    @classmethod
    def create(cls, height, width, out_height, out_width, interpolation,
               tile_h=8, tile_w=128, win_h=64, win_w=512, source_rect=None,
               win_k=0, exact8=False, win_r=0, band_mode=None, ewa_cap=4,
               ewa_cap_y=None):
        # plane dims padded to the f32 tile grid so aligned window origins can
        # reach every edge; src_rect keeps the true extent (padding reads bg).
        # win_k < win_w enables the ROLLED mode: the DMA window stays
        # 128-lane-aligned and win_w wide (Mosaic requires aligned lane
        # slices), but the kernel rolls the tile's actual source band to lane
        # 0 and computes the column mix on only win_k lanes — with win_k=128
        # the colmix matmul needs a single K-pass instead of ceil(win_w/128).
        pheight = -(-height // SUBLANE) * SUBLANE
        pwidth = -(-width // LANE) * LANE
        win_h = min(-(-win_h // SUBLANE) * SUBLANE, pheight)
        win_w = min(-(-win_w // LANE) * LANE, pwidth)
        if win_k:
            win_k = min(-(-win_k // LANE) * LANE, win_w)
        if win_r:
            win_r = -(-win_r // SUBLANE) * SUBLANE
            # the rolled band needs yoff in [0, 8) of slack inside the window
            win_h = max(win_h, min(win_r + SUBLANE, pheight))
            if win_r >= win_h:
                win_r = 0
        rect = source_rect or (0, 0, width, height)
        if band_mode is None:
            # default to the mod-8 single-compare form; the env var is an
            # experiment override only (parsed defensively: jit traces cache
            # the spec, so flipping it after tracing has no effect — pass
            # band_mode= explicitly from probe scripts for A/B runs)
            try:
                band_mode = int(os.environ.get("GF_BAND_MODE", "1"))
            except ValueError:
                band_mode = 1
            if band_mode not in (0, 1):
                band_mode = 1
        return cls(pheight, pwidth, out_height, out_width, interpolation,
                   tile_h, tile_w, win_h, win_w, rect, win_k, exact8, win_r,
                   band_mode, int(ewa_cap),
                   int(ewa_cap if ewa_cap_y is None else ewa_cap_y))

    @property
    def kw(self) -> int:
        """Effective column-mix width (lanes the matmul contracts over)."""
        return self.win_k or self.win_w

    @property
    def kh(self) -> int:
        """Effective row-mix height (rows the R mix runs over)."""
        return self.win_r or self.win_h

    @property
    def taps(self) -> int:
        """X-axis taps (EWA: ±ewa_cap stencil; separable: interp taps)."""
        if self.interpolation > 8:
            return 2 * self.ewa_cap + 2
        return INTERP_INFO[self.interpolation]["taps"]

    @property
    def taps_y(self) -> int:
        """Y-axis taps (EWA: ±ewa_cap_y stencil; separable: == taps)."""
        if self.interpolation > 8:
            return 2 * self.ewa_cap_y + 2
        return INTERP_INFO[self.interpolation]["taps"]

    @property
    def offset(self) -> float:
        if self.interpolation > 8:
            return float(self.ewa_cap)
        return INTERP_INFO[self.interpolation]["offset"]

    @property
    def offset_y(self) -> float:
        if self.interpolation > 8:
            return float(self.ewa_cap_y)
        return INTERP_INFO[self.interpolation]["offset"]

    @property
    def grid(self):
        return (pl.cdiv(self.out_height, self.tile_h), pl.cdiv(self.out_width, self.tile_w))

    @property
    def src_rect(self):
        return self.source_rect or (0, 0, self.width, self.height)


# ---------------------------------------------------------------------------
# Tap weights at the quantized phase (exact LUT semantics, arithmetic form)
# ---------------------------------------------------------------------------

def _weights_bilinear(ph):
    x = ph.astype(jnp.float32) * (1.0 / INTER_TAB_SIZE)
    return [1.0 - x, x]


def _weights_bicubic(ph):
    A = -0.75
    x = ph.astype(jnp.float32) * (1.0 / INTER_TAB_SIZE)
    w0 = ((A * (x + 1) - 5 * A) * (x + 1) + 8 * A) * (x + 1) - 4 * A
    w1 = ((A + 2) * x - (A + 3)) * x * x + 1
    w2 = ((A + 2) * (1 - x) - (A + 3)) * (1 - x) * (1 - x) + 1
    return [w0, w1, w2, 1.0 - w0 - w1 - w2]


def _weights_lanczos4(ph):
    """lanczos4 tap weights at the 32 quantized phases (cpu_undistort.rs:28-75).

    Optimized for the VPU (r5: this eval was ~1.0 ms/frame of the 4K Y
    sampler — the largest single cost after the band builds):
      * sin/cos on the narrow range y0 = -(x+3)*pi/4 in [-pi, -3pi/4] via a
        degree-5/6 Taylor pair around -7pi/8 (|t| <= pi/8: error < 1e-9,
        far below f32) instead of XLA's range-reduced sin+cos;
      * the 8 per-tap divisions by y_t^2 collapse to ONE divide via
        prefix/suffix products (1/y_t^2 = invP * pre_{t-1} * suf_{t+1});
      * no per-tap y==0 guards: y_t == 0 only at ph==0 (t==3), where the
        final phase-0 special-case select masks every NaN/inf lane.
    Matches the reference LUT arithmetic to <= 3e-7 per weight (~0.0025 of a
    10-bit code over 8 taps); measured bit-identical sampler output on the
    bench content, and prep cost 1.37 -> 0.95 ms/frame (v5e)."""
    s45 = 0.70710678118654752440084436210485
    cs = [(1.0, 0.0), (-s45, -s45), (0.0, 1.0), (s45, -s45),
          (-1.0, 0.0), (s45, s45), (0.0, -1.0), (-s45, s45)]
    PI = math.pi
    x = ph.astype(jnp.float32) * (1.0 / INTER_TAB_SIZE)
    t = -(x + 3.0) * (PI * 0.25) + (7.0 * PI / 8.0)     # |t| <= pi/8
    t2 = t * t
    st = t * (1.0 + t2 * (-1.0 / 6.0 + t2 * (1.0 / 120.0)))
    ct = 1.0 + t2 * (-0.5 + t2 * (1.0 / 24.0 + t2 * (-1.0 / 720.0)))
    C78 = math.cos(7.0 * PI / 8.0)
    S78 = math.sin(7.0 * PI / 8.0)
    s0 = st * C78 - ct * S78                            # sin(y0)
    c0 = ct * C78 + st * S78                            # cos(y0)
    ys = [-(x + 3.0 - tt) * (PI * 0.25) for tt in range(8)]
    y2 = [y * y for y in ys]
    pre = [y2[0]]
    for i in range(1, 8):
        pre.append(pre[-1] * y2[i])
    suf = [None] * 8
    suf[7] = y2[7]
    for i in range(6, -1, -1):
        suf[i] = y2[i] * suf[i + 1]
    inv_p = 1.0 / pre[7]
    raw = []
    for i in range(8):
        left = pre[i - 1] if i > 0 else None
        right = suf[i + 1] if i < 7 else None
        o = right if left is None else (left if right is None else left * right)
        raw.append((cs[i][0] * s0 + cs[i][1] * c0) * (inv_p * o))
    total = raw[0]
    for tt in range(1, 8):
        total = total + raw[tt]
    inv = 1.0 / total
    is_zero = ph == 0
    out = []
    for tt in range(8):
        special = jnp.float32(1.0 if tt == 3 else 0.0)
        out.append(jnp.where(is_zero, special, raw[tt] * inv))
    return out


_WEIGHT_FNS = {2: _weights_bilinear, 4: _weights_bicubic, 8: _weights_lanczos4}


# ---------------------------------------------------------------------------
# f32-accurate MXU matmuls.
#
# The TPU MXU multiplies bf16; the DEFAULT matmul precision rounds f32
# operands to bf16 in ONE pass (measured: ~0.5% relative error -> ~5/1023
# pixel error and ~10 px geometry error in these kernels — invisible to the
# CPU-interpret goldens, real on hardware). The fixes below decompose each
# f32 operand into an exactly-bf16-representable hi part plus a residual:
# products of bf16-exact values accumulate exactly in the MXU's f32
# accumulator, so the only error left is the dropped lo*lo cross term
# (<= ~0.01 of a 10-bit code for this kernel's magnitudes).
# ---------------------------------------------------------------------------

def _dot3(a, b):
    """a @ b to ~f32 accuracy in 3 bf16 MXU passes (drops the lo*lo term).

    The two b_hi terms share one MXU call with [a_hi; a_lo] stacked on the
    M axis: M here is small (C*Sr ~ 24-96 rows vs the 128-deep array), so a
    second short stream through the already-loaded b_hi weights is much
    cheaper than a separate matmul with its own weight-load pipeline fill."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    m = a.shape[0]
    hh_lh = jnp.dot(jnp.concatenate([a_hi, a_lo], axis=0), b_hi,
                    preferred_element_type=jnp.float32)
    return (hh_lh[:m] + hh_lh[m:]
            + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32))


def _dot2_onehot(a, b01):
    """a @ b01 where b01 is exactly bf16-representable (0/1 one-hots):
    2 bf16 MXU passes, exact up to the bf16 rounding of a's residual."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    return (jnp.dot(a_hi, b01, preferred_element_type=jnp.float32)
            + jnp.dot(a_lo, b01, preferred_element_type=jnp.float32))


def _dot2_exact_a(a, b):
    """a @ b where a is ALREADY exactly bf16-representable (uint8 pixel
    codes 0..255 fit bf16's 8-bit mantissa): only the weight operand needs a
    hi/lo split — 2 bf16 MXU passes. The dropped error is a @ (b_lo -
    bf16(b_lo)) <= 255 * taps * 2^-18: far below 8-bit quantization."""
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    return (jnp.dot(a, b_hi, preferred_element_type=jnp.float32)
            + jnp.dot(a, b_lo, preferred_element_type=jnp.float32))


# ---------------------------------------------------------------------------
# Banded one-hot builds (shared by the separable and fused kernels)
# ---------------------------------------------------------------------------

def _tap_tree_nomask(T, ws):
    """weight[T] via a log2(n)-deep bit-select tree (T assumed in [0, n))."""
    level = list(ws)         # (1, P) rows
    bit = 0
    while len(level) > 1:
        b = (T >> bit) & 1
        level = [jnp.where(b == 1, level[i + 1], level[i])
                 for i in range(0, len(level), 2)]
        bit += 1
    return level[0]


def _tap_tree(T, ws):
    """weight[T] via a log2(n)-deep bit-select tree, 0 outside [0, n)."""
    n = len(ws)
    return jnp.where((T >= 0) & (T < n), _tap_tree_nomask(T, ws), 0.0)


def build_onehot(ids, rel, ws):
    """Σ_t onehot(rel + t) · ws[t] as one banded select.

    For power-of-two tap counts, T = ids - rel indexes the tap directly,
    so the weight is picked by a bit-select tree instead of `taps` full
    compare+select+add passes — the dominant VPU cost of the kernel."""
    n = len(ws)
    if n & (n - 1):          # non-power-of-two: plain per-tap one-hots
        acc = jnp.zeros(ids.shape, jnp.float32)
        for t in range(n):
            acc = acc + jnp.where(ids == rel + t, ws[t], 0.0)
        return acc
    T = ids - rel            # (S, P); tap index per source line
    return _tap_tree(T, ws)


def build_onehot8_blocked(S, rel, ws, P):
    """8-tap banded matrix built on SMALL shapes, combined in 2 selects.

    Writing rel = 8*fH + s, row c = 8*cH + cL of the band is
      ws[cL - s]      when cH == fH      (cL >= s)
      ws[cL + 8 - s]  when cH == fH + 1  (cL <  s)
    so the weight-by-tap tree runs on (8, P) instead of (S, P) and the
    (S, P)-scale work drops from ~17 ops to 2 compares + 2 selects —
    a ~3x cut of the kernel's dominant VPU cost (measured on v5e)."""
    nb = S // 8
    fH = rel >> 3
    s = rel & 7
    cL = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    U = _tap_tree(cL - s, ws)          # (8, P): cH == fH block
    V = _tap_tree(cL + (8 - s), ws)    # (8, P): cH == fH+1 block
    bH = jax.lax.broadcasted_iota(jnp.int32, (nb, P), 0)
    A0 = jax.lax.broadcast_in_dim(bH == fH, (nb, 8, P), (0, 2)).reshape(S, P)
    A1 = jax.lax.broadcast_in_dim(bH == fH + 1, (nb, 8, P), (0, 2)).reshape(S, P)
    Ue = jax.lax.broadcast_in_dim(U, (nb, 8, P), (1, 2)).reshape(S, P)
    Ve = jax.lax.broadcast_in_dim(V, (nb, 8, P), (1, 2)).reshape(S, P)
    return jnp.where(A0, Ue, jnp.where(A1, Ve, 0.0))


def build_onehot8_mod(S, rel, ws, P):
    """8-tap banded matrix via the mod-8 identity: ONE (S, P) select.

    Writing rel = 8*fH + s and row c = 8*cH + cL, the tap index
    T = c - rel lies in [0, 8) iff cH == fH + (cL < s), and there
    T == (cL - s) & 7. So the band is the (8, P) matrix
    ws[(cL - s) & 7] tiled nb times down the rows, masked by a single
    compare against the per-(cL, p) target block tH — the (S, P)-scale
    work drops from the blocked form's 2 compares + 2 selects to
    1 compare + 1 select (the r3 trace put the band builds at 5.1 of
    14.4 ms/frame, vreg-write-bandwidth-bound)."""
    nb = S // 8
    fH = rel >> 3                   # (1, P); arithmetic shift floors
    s = rel & 7
    cL = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    Um = _tap_tree_nomask((cL - s) & 7, ws)              # (8, P)
    tH = fH + (cL < s).astype(jnp.int32)                 # (8, P)
    bH = jax.lax.broadcasted_iota(jnp.int32, (nb, 8, P), 0)
    tH3 = jax.lax.broadcast_in_dim(tH, (nb, 8, P), (1, 2))
    Um3 = jax.lax.broadcast_in_dim(Um, (nb, 8, P), (1, 2))
    return jnp.where(bH == tH3, Um3, 0.0).reshape(S, P)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

GROUP = 8   # output tiles per grid step (the (GROUP, P) block tiles natively)


def _group_size(spec: SamplerSpec, nchan: int) -> int:
    """Tiles per grid step, bounded by a VMEM budget for the windows."""
    budget = 6 * 1024 * 1024
    per = nchan * spec.win_h * spec.win_w * 4
    return max(1, min(GROUP, budget // max(per, 1)))


def prep_taps(spec: SamplerSpec, u, v):
    """Per-pixel tap setup shared by the separable kernels.

    u, v: (G, P) source coordinates. Returns (fx, fy, wxm, wym, bg_weight):
    absolute tap-0 col/row, per-tap weights with the source-rect mask folded
    in, and the separable background weight."""
    taps = spec.taps
    srx, sry, srw, srh = spec.src_rect
    u = u - spec.offset
    v = v - spec.offset
    sx0 = jnp.rint(u * INTER_TAB_SIZE).astype(jnp.int32)
    sy0 = jnp.rint(v * INTER_TAB_SIZE).astype(jnp.int32)
    fx = (sx0 >> INTER_BITS)
    fy = (sy0 >> INTER_BITS)
    phx = sx0 & (INTER_TAB_SIZE - 1)
    phy = sy0 & (INTER_TAB_SIZE - 1)
    wx = _WEIGHT_FNS[spec.interpolation](phx)
    wy = _WEIGHT_FNS[spec.interpolation](phy)
    wxm = []
    csum = jnp.zeros_like(u)
    for t in range(taps):
        ok = ((fx + t >= srx) & (fx + t < srx + srw)).astype(jnp.float32)
        w = wx[t] * ok
        wxm.append(w)
        csum = csum + w
    wym = []
    rsum = jnp.zeros_like(v)
    for t in range(taps):
        ok = ((fy + t >= sry) & (fy + t < sry + srh)).astype(jnp.float32)
        w = wy[t] * ok
        wym.append(w)
        rsum = rsum + w
    return fx, fy, wxm, wym, 1.0 - rsum * csum


def tile_sample(spec: SamplerSpec, win_j, fx_rel, fy_rel, wxm_j, wym_j,
                xoff, yoff):
    """Band build + colmix + rowmix for ONE tile.

    win_j: (C, Sr, Sc) VMEM window view (DMA already waited); fx_rel/fy_rel:
    (1, P) tap-0 col/row relative to the rolled band origin; wxm_j/wym_j:
    per-tap (1, P) masked weights. Returns nchan rows of (1, P) sampled
    values (background not yet blended)."""
    Sr, Sc = spec.win_h, spec.win_w
    Kw, Kh = spec.kw, spec.kh
    nchan = win_j.shape[0]
    taps = spec.taps
    P = fx_rel.shape[-1]
    if taps == 8 and spec.band_mode == 1:
        C = build_onehot8_mod(Kw, fx_rel, wxm_j, P)
        R = build_onehot8_mod(Kh, fy_rel, wym_j, P)
    elif taps == 8:
        C = build_onehot8_blocked(Kw, fx_rel, wxm_j, P)
        R = build_onehot8_blocked(Kh, fy_rel, wym_j, P)
    else:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (Kw, P), 0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Kh, P), 0)
        C = build_onehot(col_ids, fx_rel, wxm_j)
        R = build_onehot(row_ids, fy_rel, wym_j)
    if Kh < Sr:
        w3 = pltpu.roll(win_j, (Sr - yoff) % Sr, 1)
        win_all = w3[:, :Kh, :].reshape(nchan * Kh, Sc)
    else:
        win_all = win_j.reshape(nchan * Sr, Sc)
    if Kw < Sc:
        win_all = pltpu.roll(win_all, (Sc - xoff) % Sc, 1)[:, :Kw]
    colmix = (_dot2_exact_a(win_all, C) if spec.exact8
              else _dot3(win_all, C))                # (C*Kh, P)
    return [jnp.sum(R * colmix[ch * Kh:(ch + 1) * Kh], axis=0, keepdims=True)
            for ch in range(nchan)]


def _sampler_kernel(spec: SamplerSpec, G: int,
                    y0_ref, x0_ref, xoff_ref,  # scalar prefetch (ntiles,)
                    yoff_ref,                  # scalar prefetch (ntiles,)
                    img_ref,                   # ANY (HBM): (C, H, W)
                    u_ref, v_ref,              # VMEM (1, G, P)
                    bg_ref,                    # SMEM (1, C)
                    out_ref,                   # VMEM (C, 1, G, P)
                    win_ref, sems):            # scratch: (G, C, Sr, Sc) + G sems
    Sr, Sc = spec.win_h, spec.win_w
    nchan = win_ref.shape[1]

    g = pl.program_id(0)

    def win_dma(j):
        tile = g * G + j
        ty0 = pl.multiple_of(y0_ref[tile], SUBLANE)   # host aligns origins
        tx0 = pl.multiple_of(x0_ref[tile], LANE)
        return pltpu.make_async_copy(
            img_ref.at[:, pl.ds(ty0, Sr), pl.ds(tx0, Sc)],
            win_ref.at[j], sems.at[j])

    for j in range(G):
        win_dma(j).start()

    # Per-pixel math runs ONCE on the whole (G, P) block — natural (8, 128)
    # tiling; the per-tile one-hot builds below slice (1, P) rows out of it.
    fx, fy, wxm, wym, bg_weight = prep_taps(spec, u_ref[0], v_ref[0])

    # NOTE (r3 negative result, don't retry): materializing the C band
    # as bf16 hi/lo (either pre-split tap weights or one explicit cast)
    # is SLOWER than _dot3 on f32 — bf16 VPU values live in (16, 128)
    # vregs, so every select/cast pays a sublane repack, while the dot's
    # internal f32->bf16 operand conversion is fused into the MXU feed
    # (measured 9.81 vs 8.65 ms 4K Y; pre-split trips a Mosaic i1
    # relayout error outright).
    sampled_rows = [[] for _ in range(nchan)]
    for j in range(G):
        tile = g * G + j
        y0 = pl.multiple_of(y0_ref[tile], SUBLANE)
        x0 = pl.multiple_of(x0_ref[tile], LANE)
        xoff = pl.multiple_of(xoff_ref[tile], SUBLANE)
        yoff = yoff_ref[tile]              # 0 when row rolling is disabled
        fx_rel = fx[j:j + 1] - x0 - xoff   # xoff == 0 when rolling is disabled
        fy_rel = fy[j:j + 1] - y0 - yoff
        wxm_j = [w[j:j + 1] for w in wxm]
        wym_j = [w[j:j + 1] for w in wym]
        win_dma(j).wait()
        # All channels share the C/R builds AND one stacked colmix matmul:
        # win (C, Sr, Sc) viewed as (C*Sr, Sc) puts channels on the M axis,
        # which is free on the MXU up to 128 rows. The matmul itself runs as
        # 3 bf16 passes (_dot3) for f32-accurate pixels — the MXU's 1-pass
        # default rounds operands to bf16 (~5/1023 pixel error, fails parity)
        # — or 2 passes when the content is uint8 codes (exactly bf16).
        rows = tile_sample(spec, win_ref[j], fx_rel, fy_rel, wxm_j, wym_j,
                           xoff, yoff)
        for ch in range(nchan):
            sampled_rows[ch].append(rows[ch])            # (1, P)

    # background blend + output write once per group on (G, P) blocks
    for ch in range(nchan):
        s_all = jnp.concatenate(sampled_rows[ch], axis=0)     # (G, P)
        out_ref[ch, 0] = s_all + bg_weight * bg_ref[0, ch]


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def _sample_call(spec: SamplerSpec, img, u_t, v_t, y0s, x0s, xoffs, yoffs, bg,
                 interpret=False):
    """Run the grouped sampler. Returns (C, ntiles, P) channel-major output.

    Tiles run G (usually 8) per grid step so every pixel-row operand crosses
    the Pallas boundary as a natural (8, 128)-tiled (G, P) block — (1, P)
    rows force a degenerate T(1,128) layout on the producing/consuming XLA
    fusions (measured ~2x the cost on the coords feed path) — and the G
    window DMAs prefetch ahead of the per-tile compute."""
    ntiles = u_t.shape[0]
    nchan = img.shape[0]
    P = spec.tile_h * spec.tile_w
    G = _group_size(spec, nchan)
    ng = pl.cdiv(ntiles, G)
    pad = ng * G - ntiles
    if pad:
        u_t = jnp.pad(u_t, ((0, pad), (0, 0)))
        v_t = jnp.pad(v_t, ((0, pad), (0, 0)))
        y0s = jnp.pad(y0s, (0, pad))
        x0s = jnp.pad(x0s, (0, pad))
        xoffs = jnp.pad(xoffs, (0, pad))
        yoffs = jnp.pad(yoffs, (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # img (C, H, W) HBM
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, nchan), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nchan, 1, G, P), lambda i, *_: (0, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, nchan, spec.win_h, spec.win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_sampler_kernel, spec, G),
        out_shape=jax.ShapeDtypeStruct((nchan, ng, G, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(y0s, x0s, xoffs, yoffs, img, u_t.reshape(ng, G, P), v_t.reshape(ng, G, P), bg)
    out = out.reshape(nchan, ng * G, P)
    return out[:, :ntiles] if pad else out


def _tileize(spec: SamplerSpec, x):
    """(OH', OW') -> (ntiles, P): row-major tiles, each flattened to one row."""
    ny, nx = spec.grid
    TH, TW = spec.tile_h, spec.tile_w
    return (x.reshape(ny, TH, nx, TW)
             .transpose(0, 2, 1, 3)
             .reshape(ny * nx, TH * TW))


def _untileize(spec: SamplerSpec, x):
    ny, nx = spec.grid
    TH, TW = spec.tile_h, spec.tile_w
    return (x.reshape(ny, nx, TH, TW)
             .transpose(0, 2, 1, 3)
             .reshape(ny * TH, nx * TW))


def _out_untileize(spec: SamplerSpec, x):
    return _untileize(spec, x.reshape(x.shape[0], x.shape[-1]))


# ---------------------------------------------------------------------------
# Host/XLA-side window planning + public entry
# ---------------------------------------------------------------------------

def _pad_to(x, th, tw, fill=0.0):
    oh, ow = x.shape
    ph = (-oh) % th
    pw = (-ow) % tw
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), constant_values=fill)
    return x


@functools.partial(jax.jit, static_argnames=("spec",))
def plan_windows(spec: SamplerSpec, u, v, valid):
    """Per-tile window origins + overflow flag from the uv map (all on device).

    u, v: (OH', OW') padded uv; valid: bool mask. Origins are lane-aligned.
    """
    TH, TW = spec.tile_h, spec.tile_w
    ny, nx = spec.grid
    taps = spec.taps
    taps_y = spec.taps_y

    def tilewise(arr, fill):
        a = jnp.where(valid, arr, fill)
        return a.reshape(ny, TH, nx, TW)

    big = jnp.float32(1e9)
    umin = tilewise(u, big).min(axis=(1, 3))
    umax = tilewise(u, -big).max(axis=(1, 3))
    vmin = tilewise(v, big).min(axis=(1, 3))
    vmax = tilewise(v, -big).max(axis=(1, 3))

    any_valid = valid.reshape(ny, TH, nx, TW).any(axis=(1, 3))
    umin = jnp.where(any_valid, umin, 0.0)
    umax = jnp.where(any_valid, umax, 0.0)
    vmin = jnp.where(any_valid, vmin, 0.0)
    vmax = jnp.where(any_valid, vmax, 0.0)

    off = spec.offset
    off_y = spec.offset_y          # EWA: per-axis stencil radii
    xf = (jnp.floor(umin - off).astype(jnp.int32) - 1) & ~(SUBLANE - 1)
    x0 = xf & ~(LANE - 1)
    yf = jnp.floor(vmin - off_y).astype(jnp.int32) - 1
    y0 = yf & ~(SUBLANE - 1)
    x0 = jnp.clip(x0, 0, max(spec.width - spec.win_w, 0))
    y0 = jnp.clip(y0, 0, max(spec.height - spec.win_h, 0))
    xf = jnp.clip(xf, x0, x0 + spec.win_w - SUBLANE)
    xoff = (xf - x0) if spec.kw < spec.win_w else jnp.zeros_like(x0)
    xband = xf if spec.kw < spec.win_w else x0
    if spec.win_r and spec.win_r < spec.win_h:
        yf = jnp.clip(yf, y0, y0 + spec.win_h - spec.win_r)
        yoff = yf - y0
        yband = yf
    else:
        yoff = jnp.zeros_like(y0)
        yband = y0

    # the farthest in-rect tap each tile needs
    srx, sry, srw, srh = spec.src_rect
    xlast = jnp.minimum(jnp.floor(umax - off).astype(jnp.int32) + taps, srx + srw - 1)
    ylast = jnp.minimum(jnp.floor(vmax - off_y).astype(jnp.int32) + taps_y, sry + srh - 1)
    xfirst = jnp.maximum(jnp.floor(umin - off).astype(jnp.int32), srx)
    yfirst = jnp.maximum(jnp.floor(vmin - off_y).astype(jnp.int32), sry)
    overflow = (((xlast - xband >= spec.kw) | (xlast - x0 >= spec.win_w) |
                 (ylast - yband >= spec.kh) | (ylast - y0 >= spec.win_h)) &
                (xlast >= xfirst) & (ylast >= yfirst) & any_valid)

    return (y0.reshape(-1), x0.reshape(-1), xoff.reshape(-1),
            yoff.reshape(-1), overflow.any())


def sample_planes(spec: SamplerSpec, imgs, u, v, valid, bg_vec):
    """Sample all channels in ONE kernel: imgs (C, H, W), uv maps (OH, OW).

    The per-pixel one-hot C/R builds (the dominant VPU cost) are shared
    across channels; each extra channel adds only a matmul + row reduce.
    Returns ((C, OH, OW), overflow).
    """
    nchan = imgs.shape[0]
    if imgs.shape[1:] != (spec.height, spec.width):
        imgs = jnp.pad(imgs, ((0, 0), (0, spec.height - imgs.shape[1]),
                              (0, spec.width - imgs.shape[2])))
    up = _pad_to(u, spec.tile_h, spec.tile_w)
    vp = _pad_to(v, spec.tile_h, spec.tile_w)
    validp = _pad_to(valid.astype(jnp.float32), spec.tile_h, spec.tile_w) > 0.5
    up = jnp.where(jnp.isfinite(up), up, 0.0)
    vp = jnp.where(jnp.isfinite(vp), vp, 0.0)
    up = jnp.clip(up, -32768.0, 32768.0)
    vp = jnp.clip(vp, -32768.0, 32768.0)

    y0s, x0s, xoffs, yoffs, overflow = plan_windows(spec, up, vp, validp)
    bg = jnp.asarray(bg_vec, jnp.float32).reshape(1, nchan)
    interpret = jax.default_backend() == "cpu"  # Mosaic is TPU-only; tests interpret
    out_t = _sample_call(spec, imgs, _tileize(spec, up), _tileize(spec, vp),
                         y0s, x0s, xoffs, yoffs, bg, interpret=interpret)
    return out_untileize_c(spec, out_t), overflow


def sample_plane(spec: SamplerSpec, img, u, v, valid, bg_scalar):
    """Single-channel wrapper over sample_planes."""
    out, overflow = sample_planes(spec, img[None], u, v, valid,
                                  jnp.asarray(bg_scalar, jnp.float32).reshape(1))
    return out[0], overflow


# ---------------------------------------------------------------------------
# EWA elliptical kernel (non-separable weights)
# ---------------------------------------------------------------------------

def _ewa_kernel(spec: SamplerSpec,
                y0_ref, x0_ref,            # scalar prefetch (ntiles,)
                xoff_ref, yoff_ref,        # scalar prefetch (ntiles,)
                img_ref,                   # ANY (HBM): (C, H, W)
                u_ref, v_ref,              # VMEM (1, P)
                jac_ref,                   # VMEM (1, 4, P): jx, jy, jz, jw
                pq_ref,                    # SMEM (1, 8): bc2 p0..p3, q0..q3
                bg_ref,                    # SMEM (1, C)
                out_ref,                   # VMEM (1, C, P)
                win_ref, sem):
    """EWA sampling (cpu_undistort.rs:267-369) in the window-DMA formulation.

    The elliptical weight k(typ, txp, pixel) is not separable, so the kernel
    contracts ONE exact one-hot column matrix Cm = onehot(bx_rel) against the
    window statically rolled left by each tap column txp (all taps stacked on
    the matmul M axis: one weight-load pipeline fill), then applies the
    per-(typ, txp) weights to the gathered rows. The weights are analytic in
    (fx, fy) and fy is affine in the source row index, so they evaluate
    DIRECTLY on full-sublane row stacks — (Kh, P) band space for the pixel
    mix, (taps, P) typ space for the normalization sums — with no per-tap
    (1, P) degenerate-layout math and no bit-select trees. Rolled compute
    windows (spec.win_k / win_r) shrink the matmul K/M dims to the tile's
    actual source band (same mechanics as the separable kernel: the DMA
    stays lane/sublane aligned, the kernel rolls the band to lane 0)."""
    Sr, Sc = spec.win_h, spec.win_w
    Kh, Kw = spec.kh, spec.kw
    nchan = win_ref.shape[0]
    taps = spec.taps               # X taps = 2*spec.ewa_cap + 2 (the loop)
    taps_y = spec.taps_y           # Y taps = 2*spec.ewa_cap_y + 2 (typ rows)
    P = spec.tile_h * spec.tile_w
    srx, sry, srw, srh = spec.src_rect

    t_idx = pl.program_id(0)
    y0 = pl.multiple_of(y0_ref[t_idx], SUBLANE)
    x0 = pl.multiple_of(x0_ref[t_idx], LANE)
    xoff = pl.multiple_of(xoff_ref[t_idx], SUBLANE)
    yoff = yoff_ref[t_idx]

    copy = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(y0, Sr), pl.ds(x0, Sc)], win_ref, sem)
    copy.start()

    u = u_ref[0]                                   # (1, P)
    v = v_ref[0]
    J = jac_ref[0]                                 # (4, P)
    jx, jy, jz, jw = J[0:1], J[1:2], J[2:3], J[3:4]

    # affine_bbox (cpu_undistort.rs:272-277)
    tx = 2.0 * jnp.maximum(jnp.maximum(jnp.abs(jx + jy), jnp.abs(jx - jy)), 1.0)
    ty = 2.0 * jnp.maximum(jnp.maximum(jnp.abs(jz + jw), jnp.abs(jz - jw)), 1.0)
    bx0 = jnp.floor(u - tx).astype(jnp.int32)
    bx1 = jnp.ceil(u + tx).astype(jnp.int32)
    by0 = jnp.floor(v - ty).astype(jnp.int32)
    by1 = jnp.ceil(v + ty).astype(jnp.int32)

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

    pw = [pq_ref[0, i] for i in range(4)]
    qw = [pq_ref[0, 4 + i] for i in range(4)]

    def bc2(dr):
        # piecewise cubic in x = sqrt(dr), Estrin on (x², x): the x² terms
        # are just dr, so only ONE sqrt and ONE fused mul-add chain run on
        # the big (Kh, P)/(taps, P) stacks. Selecting the p/q COEFFICIENTS
        # first (4 selects) then evaluating one chain is bit-identical to
        # evaluating both chains and selecting the result, and drops ~4 VPU
        # ops per element (r5: 4K EWA step -1.3 ms/frame).
        x = jnp.sqrt(dr)
        lo = dr < 1.0
        c0 = jnp.where(lo, pw[0], qw[0])
        c1 = jnp.where(lo, pw[1], qw[1])
        c2 = jnp.where(lo, pw[2], qw[2])
        c3 = jnp.where(lo, pw[3], qw[3])
        r = (c0 + c2 * dr) + x * (c1 + c3 * dr)
        return jnp.where(dr < 4.0, r, 0.0)

    base_x = jnp.floor(u).astype(jnp.int32) - spec.ewa_cap   # absolute tap-0 col
    base_y = jnp.floor(v).astype(jnp.int32) - spec.ewa_cap_y
    bx_rel = base_x - x0 - xoff           # tap-0 col inside the rolled band
    # The shared one-hot must FIRE even when tap 0 falls outside the band
    # (plan_windows clips window origins to the plane, so base_x can be
    # negative at the left source edge). Clamping the anchor is exact
    # because the band-space weights below are computed from the ABSOLUTE
    # gathered column in_xg (analytic in fx), not from the tap index — a
    # shifted anchor just gathers a shifted column run, each column getting
    # its true weight, with the stencil/rect masks zeroing the rest. The
    # in-rect∩stencil columns stay covered: when the clamp binds upward
    # (bx_rel < 0) the run [xband, xband+taps) contains them all.
    gx_rel = jnp.clip(bx_rel, 0, Kw - 1)  # gather anchor inside the band
    yband = y0 + yoff                     # absolute source row of band row 0

    # Row-index stacks. The elliptical weight is an analytic function of
    # (fx, fy) and fy is AFFINE in the source row index, so weights evaluate
    # directly on full-sublane stacks — no (1, P) degenerate layouts and no
    # bit-select trees (the trees exist in the separable kernel only because
    # its weights are discrete LUT-phase taps):
    #  * typ space (taps, P): rows = stencil tap index. Index-complete — used
    #    for ksum_all/ksum_rect, whose out-of-rect taps may fall outside the
    #    DMA'd window (plan_windows only guarantees IN-RECT taps in-window).
    #  * band space (Kh, P): rows = window band row. Aligned with colmix —
    #    used for the pixel accumulation weights (in-rect taps only, which
    #    plan_windows guarantees are in-band for valid, non-overflowed tiles).
    ty10 = jax.lax.broadcasted_iota(jnp.int32, (taps_y, P), 0)
    in_y10 = base_y + ty10                             # absolute, (taps_y, P)
    fy10 = in_y10.astype(jnp.float32) - v
    fy10_z = fy10 * fy10 * abc_z                         # shared across taps
    y_bb10 = (in_y10 >= by0) & (in_y10 <= by1)
    y_rect10 = (in_y10 >= sry) & (in_y10 < sry + srh)

    rb = jax.lax.broadcasted_iota(jnp.int32, (Kh, P), 0)
    in_yb = yband + rb                                   # absolute, (Kh, P)
    fyb = in_yb.astype(jnp.float32) - v
    fyb_z = fyb * fyb * abc_z                            # shared across taps
    typb = in_yb - base_y
    band_ok = ((typb >= 0) & (typb < taps_y) &           # inside the stencil
               (in_yb >= by0) & (in_yb <= by1) &         # inside the bbox
               (in_yb >= sry) & (in_yb < sry + srh))     # inside the rect

    copy.wait()

    # Roll the tile's exact row band to sublane 0 (win_r mode) and stack the
    # channels on the matmul M axis.
    if Kh < Sr:
        w3 = pltpu.roll(win_ref[...], (Sr - yoff) % Sr, 1)[:, :Kh, :]
    else:
        w3 = win_ref[...]
    win_all = w3.reshape(nchan * Kh, Sc)
    # hi/lo split once per window: the colmix matmul contracts an EXACT 0/1
    # one-hot, so two bf16 passes over (win_hi, win_lo) reproduce the f32
    # gather exactly (the MXU's 1-pass default rounds pixels to bf16). uint8
    # content is already bf16-exact: single pass, no split.
    if spec.exact8:
        win_hi, win_lo = win_all, None
    else:
        win_hi = win_all.astype(jnp.bfloat16).astype(jnp.float32)
        win_lo = win_all - win_hi

    # ONE one-hot column matrix + ONE stacked matmul: the window statically
    # rolled left by each tap column txp rides the M axis ([txp][ch][row]),
    # so all taps*C*Kh gathered rows share a single weight-load pipeline
    # fill instead of `taps` separate matmuls with their own.
    def tap_stack(w):
        return jnp.concatenate(
            [pltpu.roll(w, (Sc - xoff - txp) % Sc, 1)[:, :Kw]
             for txp in range(taps)], axis=0)            # (taps*C*Kh, Kw)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Kw, P), 0)
    Cm = jnp.where(col_ids == gx_rel, 1.0, 0.0)
    if win_lo is None:
        colmix = jnp.dot(tap_stack(win_hi), Cm,
                         preferred_element_type=jnp.float32)
    else:
        # hi/lo share ONE matmul call with the lo rows M-stacked under the
        # hi rows: the kernel is weight-load-fill bound (N = P needs
        # ceil(P/128) weight tiles; two separate calls pay every fill
        # twice), so streaming both operands through one set of fills cuts
        # the matmul cost ~17% (r4, v5e). Bit-exact: same two products.
        both = jnp.dot(jnp.concatenate([tap_stack(win_hi), tap_stack(win_lo)],
                                       axis=0), Cm,
                       preferred_element_type=jnp.float32)
        m = taps * nchan * Kh
        colmix = both[:m] + both[m:]

    acc = [jnp.zeros((Kh, P), jnp.float32) for _ in range(nchan)]
    ksum_all = jnp.zeros((taps_y, P), jnp.float32)
    ksum_rect = jnp.zeros((taps_y, P), jnp.float32)
    xband = x0 + xoff                     # absolute source col of band col 0
    for txp in range(taps):
        # typ space: normalization sums over the full stencil ∩ bbox,
        # anchored at base_x (index-complete even off-plane)
        in_x = base_x + txp
        fx = in_x.astype(jnp.float32) - u
        fx_abc = fx * fx * abc_x
        fx_y = fx * abc_y
        x_bbox = (in_x >= bx0) & (in_x <= bx1)
        x_rect = (in_x >= srx) & (in_x < srx + srw)
        dr10 = fx_abc + fy10 * fx_y + fy10_z
        k10 = bc2(jnp.maximum(dr10, 0.0))
        k10 = jnp.where(x_bbox & y_bb10, k10, 0.0)
        ksum_all = ksum_all + k10
        ksum_rect = ksum_rect + jnp.where(x_rect & y_rect10, k10, 0.0)

        # band space: weights for the ACTUAL gathered column (anchored at
        # the clamped gx_rel — equals base_x + txp except at the left edge),
        # masked to stencil ∩ bbox ∩ rect
        in_xg = xband + gx_rel + txp
        fxg = in_xg.astype(jnp.float32) - u
        g_ok = ((in_xg >= base_x) & (in_xg < base_x + taps) &
                (in_xg >= bx0) & (in_xg <= bx1) &
                (in_xg >= srx) & (in_xg < srx + srw))
        drb = fxg * fxg * abc_x + fyb * (fxg * abc_y) + fyb_z
        kb = bc2(jnp.maximum(drb, 0.0))
        kb = jnp.where(g_ok & band_ok, kb, 0.0)
        for ch in range(nchan):
            rows = colmix[(txp * nchan + ch) * Kh:(txp * nchan + ch + 1) * Kh]
            acc[ch] = acc[ch] + kb * rows

    ksum_all = jnp.sum(ksum_all, axis=0, keepdims=True)
    ksum_rect = jnp.sum(ksum_rect, axis=0, keepdims=True)
    denom = jnp.where(ksum_all == 0.0, 1.0, ksum_all)
    k_bg = ksum_all - ksum_rect
    for ch in range(nchan):
        s = jnp.sum(acc[ch], axis=0, keepdims=True)
        out_ref[0, ch] = ((s + k_bg * bg_ref[0, ch]) / denom)[0]


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def _ewa_call(spec: SamplerSpec, img, u_t, v_t, jac_t, y0s, x0s, xoffs, yoffs,
              pq, bg, interpret=False):
    ntiles = u_t.shape[0]
    nchan = img.shape[0]
    P = spec.tile_h * spec.tile_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 4, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 8), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nchan), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, nchan, P), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nchan, spec.win_h, spec.win_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_ewa_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((ntiles, nchan, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(y0s, x0s, xoffs, yoffs, img, u_t.reshape(ntiles, 1, P),
      v_t.reshape(ntiles, 1, P), jac_t, pq, bg)


def sample_planes_ewa(spec: SamplerSpec, imgs, u, v, jac, valid, bg_vec,
                      pq_coeffs):
    """EWA sampling of all channels: imgs (C, H, W), uv/jac maps (OH, OW[, 4]).

    Returns ((C, OH, OW), overflow)."""
    nchan = imgs.shape[0]
    if imgs.shape[1:] != (spec.height, spec.width):
        imgs = jnp.pad(imgs, ((0, 0), (0, spec.height - imgs.shape[1]),
                              (0, spec.width - imgs.shape[2])))
    up = _pad_to(u, spec.tile_h, spec.tile_w)
    vp = _pad_to(v, spec.tile_h, spec.tile_w)
    validp = _pad_to(valid.astype(jnp.float32), spec.tile_h, spec.tile_w) > 0.5
    up = jnp.clip(jnp.where(jnp.isfinite(up), up, 0.0), -32768.0, 32768.0)
    vp = jnp.clip(jnp.where(jnp.isfinite(vp), vp, 0.0), -32768.0, 32768.0)

    y0s, x0s, xoffs, yoffs, overflow = plan_windows(spec, up, vp, validp)
    P = spec.tile_h * spec.tile_w
    ntiles = spec.grid[0] * spec.grid[1]
    jac_t = jnp.stack([_tileize(spec, _pad_to(jac[..., i], spec.tile_h, spec.tile_w))
                       for i in range(4)], axis=1)       # (ntiles, 4, P)
    pq = jnp.concatenate([jnp.asarray(pq_coeffs[0], jnp.float32).reshape(4),
                          jnp.asarray(pq_coeffs[1], jnp.float32).reshape(4)]
                         ).reshape(1, 8)
    bg = jnp.asarray(bg_vec, jnp.float32).reshape(1, nchan)
    interpret = jax.default_backend() == "cpu"
    out_t = _ewa_call(spec, imgs, _tileize(spec, up), _tileize(spec, vp),
                      jac_t, y0s, x0s, xoffs, yoffs, pq, bg,
                      interpret=interpret)
    return out_untileize_c(spec, jnp.moveaxis(out_t, 1, 0)), overflow


# ---------------------------------------------------------------------------
# Tiled-layout entries: callers that already hold (ntiles, P) pixel rows skip
# the full-frame tileize/untileize transposes entirely
# ---------------------------------------------------------------------------

def plan_windows_t(spec: SamplerSpec, u_t, v_t, valid_t):
    """plan_windows on flat-tiled (ntiles, P) maps — a per-row reduce."""
    big = jnp.float32(1e9)
    umin = jnp.min(jnp.where(valid_t, u_t, big), axis=1)
    umax = jnp.max(jnp.where(valid_t, u_t, -big), axis=1)
    vmin = jnp.min(jnp.where(valid_t, v_t, big), axis=1)
    vmax = jnp.max(jnp.where(valid_t, v_t, -big), axis=1)
    any_valid = valid_t.any(axis=1)
    umin = jnp.where(any_valid, umin, 0.0)
    umax = jnp.where(any_valid, umax, 0.0)
    vmin = jnp.where(any_valid, vmin, 0.0)
    vmax = jnp.where(any_valid, vmax, 0.0)

    off = spec.offset
    taps = spec.taps
    off_y = spec.offset_y          # EWA: per-axis stencil radii
    taps_y = spec.taps_y
    xf = (jnp.floor(umin - off).astype(jnp.int32) - 1) & ~(SUBLANE - 1)
    x0 = xf & ~(LANE - 1)
    yf = jnp.floor(vmin - off_y).astype(jnp.int32) - 1
    y0 = yf & ~(SUBLANE - 1)
    x0 = jnp.clip(x0, 0, max(spec.width - spec.win_w, 0))
    y0 = jnp.clip(y0, 0, max(spec.height - spec.win_h, 0))
    xf = jnp.clip(xf, x0, x0 + spec.win_w - SUBLANE)
    xoff = (xf - x0) if spec.kw < spec.win_w else jnp.zeros_like(x0)
    xband = xf if spec.kw < spec.win_w else x0
    if spec.win_r and spec.win_r < spec.win_h:
        yf = jnp.clip(yf, y0, y0 + spec.win_h - spec.win_r)
        yoff = yf - y0
        yband = yf
    else:
        yoff = jnp.zeros_like(y0)
        yband = y0

    srx, sry, srw, srh = spec.src_rect
    xlast = jnp.minimum(jnp.floor(umax - off).astype(jnp.int32) + taps, srx + srw - 1)
    ylast = jnp.minimum(jnp.floor(vmax - off_y).astype(jnp.int32) + taps_y, sry + srh - 1)
    xfirst = jnp.maximum(jnp.floor(umin - off).astype(jnp.int32), srx)
    yfirst = jnp.maximum(jnp.floor(vmin - off_y).astype(jnp.int32), sry)
    overflow = (((xlast - xband >= spec.kw) | (xlast - x0 >= spec.win_w) |
                 (ylast - yband >= spec.kh) | (ylast - y0 >= spec.win_h)) &
                (xlast >= xfirst) & (ylast >= yfirst) & any_valid)
    return y0, x0, xoff, yoff, overflow.any()


def _pad_imgs(spec: SamplerSpec, imgs):
    if imgs.shape[1:] != (spec.height, spec.width):
        imgs = jnp.pad(imgs, ((0, 0), (0, spec.height - imgs.shape[1]),
                              (0, spec.width - imgs.shape[2])))
    return imgs


def _guard_uv(a):
    return jnp.clip(jnp.where(jnp.isfinite(a), a, 0.0), -32768.0, 32768.0)


def sample_planes_t(spec: SamplerSpec, imgs, u_t, v_t, valid_t, bg_vec):
    """Tiled separable sampling: u_t/v_t/valid_t (ntiles, P) -> (C, ntiles, P)."""
    imgs = _pad_imgs(spec, imgs)
    u_t = _guard_uv(u_t)
    v_t = _guard_uv(v_t)
    y0s, x0s, xoffs, yoffs, overflow = plan_windows_t(spec, u_t, v_t, valid_t)
    bg = jnp.asarray(bg_vec, jnp.float32).reshape(1, imgs.shape[0])
    interpret = jax.default_backend() == "cpu"
    out_t = _sample_call(spec, imgs, u_t, v_t, y0s, x0s, xoffs, yoffs, bg,
                         interpret=interpret)
    return out_t, overflow


def sample_planes_ewa_t(spec: SamplerSpec, imgs, u_t, v_t, jac_t, valid_t,
                        bg_vec, pq_coeffs):
    """Tiled EWA sampling: jac_t (ntiles, P, 4) -> (C, ntiles, P)."""
    imgs = _pad_imgs(spec, imgs)
    u_t = _guard_uv(u_t)
    v_t = _guard_uv(v_t)
    y0s, x0s, xoffs, yoffs, overflow = plan_windows_t(spec, u_t, v_t, valid_t)
    ntiles = u_t.shape[0]
    P = spec.tile_h * spec.tile_w
    jac4 = jnp.moveaxis(jac_t, -1, 1)            # (ntiles, 4, P)
    pq = jnp.concatenate([jnp.asarray(pq_coeffs[0], jnp.float32).reshape(4),
                          jnp.asarray(pq_coeffs[1], jnp.float32).reshape(4)]
                         ).reshape(1, 8)
    bg = jnp.asarray(bg_vec, jnp.float32).reshape(1, imgs.shape[0])
    interpret = jax.default_backend() == "cpu"
    out_t = _ewa_call(spec, imgs, u_t.reshape(ntiles, 1, P),
                      v_t.reshape(ntiles, 1, P), jac4, y0s, x0s, xoffs, yoffs,
                      pq, bg, interpret=interpret)
    return jnp.moveaxis(out_t, 1, 0), overflow   # (C, ntiles, P)


def out_untileize_c(spec: SamplerSpec, out_t):
    """(C, ntiles, P) -> (C, OH, OW) (cropped)."""
    ny, nx = spec.grid
    TH, TW = spec.tile_h, spec.tile_w
    nchan = out_t.shape[0]
    out = (out_t.reshape(nchan, ny, nx, TH, TW)
                .transpose(0, 1, 3, 2, 4)
                .reshape(nchan, ny * TH, nx * TW))
    return out[:, :spec.out_height, :spec.out_width]


def tiled_grid(spec: SamplerSpec):
    """Arithmetic (no transpose) output-pixel coordinates in tiled layout.

    Returns (ox, oy, pad_ok) each (ntiles, P): output x/y of every tile pixel
    and whether it's inside the real (unpadded) output."""
    ny, nx = spec.grid
    TH, TW = spec.tile_h, spec.tile_w
    P = TH * TW
    t_ids = jnp.arange(ny * nx, dtype=jnp.int32)[:, None]
    p_ids = jnp.arange(P, dtype=jnp.int32)[None, :]
    oy = (t_ids // nx) * TH + p_ids // TW
    ox = (t_ids % nx) * TW + p_ids % TW
    pad_ok = (ox < spec.out_width) & (oy < spec.out_height)
    return ox.astype(jnp.float32), oy.astype(jnp.float32), pad_ok

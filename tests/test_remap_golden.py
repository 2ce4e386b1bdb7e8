"""Golden tests: JAX remap pipeline vs the scalar oracle (reference CPU semantics).

Accuracy budget: <=0.5 px max remap deviation (BASELINE.json north star); we
assert far tighter since both implement the same f32 math.
"""
import math

import numpy as np
import pytest

import jax.numpy as jnp

import oracle
from gyroflow_tpu.ops import remap
from gyroflow_tpu.ops.kernel_params import (
    ANY_UNDERWATER, FILL_WITH_BACKGROUND, FIX_COLOR_RANGE, HAS_DIGITAL_LENS,
    HORIZONTAL_RS, KernelConfig, KernelDynamics,
)

W, H = 64, 48
OW, OH = 64, 48


def make_image(c=1, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 40.0 + 120.0 * (x / W) + 60.0 * (y / H)
    img = np.stack([base + 20.0 * np.sin(x / 3.0 + i) * np.cos(y / 4.0) for i in range(c)], axis=-1)
    img += rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.float32)


def rot_matrix(rx, ry, rz):
    cx, sx = math.cos(rx), math.sin(rx)
    cy, sy = math.cos(ry), math.sin(ry)
    cz, sz = math.cos(rz), math.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, 0 + cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def make_matrices(f, fov, rotations, ibis=None):
    """Rows = inv(new_k @ R) like FrameTransform::at_timestamp (frame_transform.rs:296-307)."""
    new_k = np.array([[f[0] / fov, 0, OW / 2.0], [0, f[1] / fov, OH / 2.0], [0, 0, 1.0]])
    rows = []
    for i, rot in enumerate(rotations):
        r = rot_matrix(*rot)
        # sign fixup, non-inverted framebuffer (frame_transform.rs:264-267)
        r = r.copy()
        r[0, 1] *= -1; r[0, 2] *= -1
        r[1, 0] *= -1; r[2, 0] *= -1
        i_r = np.linalg.pinv(new_k @ r)
        row = list(i_r.flatten().astype(np.float32))
        row += list(ibis[i]) if ibis is not None else [0.0] * 5
        rows.append(row)
    return np.asarray(rows, dtype=np.float32)


BASE_K = [0.25, -0.07, 0.02, -0.003]


def make_pair(flags=0, interpolation=2, background_mode=0, lens_correction_amount=1.0,
              fov=0.9, rotations=None, digital_lens=None, digital_lens_params=None,
              lrc=1.0, translation2d=(0.0, 0.0), background=(0.1, 0.5, 0.2, 1.0),
              bg_margin=0.1, bg_feather=0.05, input_rotation=0.0, f=(55.0, 55.0)):
    if rotations is None:
        rotations = [(0.02, -0.03, 0.01)]
    cfg = KernelConfig(
        width=W, height=H, output_width=OW, output_height=OH,
        interpolation=interpolation, background_mode=background_mode,
        distortion_model="opencv_fisheye", digital_lens=digital_lens,
        flags=flags | (HAS_DIGITAL_LENS if digital_lens else 0),
        lens_correction=lens_correction_amount < 1.0,
        input_rotation=input_rotation,
    )
    dyn = KernelDynamics.make(
        f=f, c=(W / 2.0, H / 2.0), k=BASE_K, fov=fov,
        lens_correction_amount=lens_correction_amount,
        background=background, background_margin=bg_margin,
        background_margin_feather=bg_feather, translation2d=translation2d,
        digital_lens_params=digital_lens_params,
        light_refraction_coefficient=lrc,
    )
    p = oracle.default_params(W, H, OW, OH)
    p.update(
        f=f, c=(W / 2.0, H / 2.0), k=BASE_K + [0.0] * 8, fov=fov,
        interpolation=interpolation, background_mode=background_mode,
        lens_correction_amount=lens_correction_amount,
        background=background, background_margin=bg_margin,
        background_margin_feather=bg_feather, translation2d=translation2d,
        digital_lens=digital_lens,
        digital_lens_params=(list(digital_lens_params) + [0.0] * 16)[:16] if digital_lens_params else [0.0] * 16,
        light_refraction_coefficient=lrc, flags=cfg.flags, input_rotation=input_rotation,
    )
    matrices = make_matrices(f, fov, rotations)
    return cfg, dyn, p, matrices


def compare(cfg, dyn, p, matrices, img, px_tol=0.05, val_tol=0.75):
    got = np.asarray(remap.remap_plane_jit(jnp.asarray(img), jnp.asarray(matrices), cfg, dyn))
    want = oracle.undistort_image(img, p, matrices)
    # pixel-value comparison (sampling differences amplify uv differences)
    diff = np.abs(got - want)
    assert diff.max() < max(val_tol, 255 * 0.02), f"pixel diff {diff.max()}"

    # geometry comparison where both produce coords
    factor = max(1.0 - p["lens_correction_amount"], 0.001)
    out_c = (OW / 2.0, OH / 2.0)
    out_f = (p["f"][0] / p["fov"] / factor, p["f"][1] / p["fov"] / factor)
    want_uv = oracle.undistort_coord_map(p, matrices)
    ys = jnp.arange(OH, dtype=jnp.float32)
    xs = jnp.arange(OW, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    got_uv, got_valid = remap.undistort_coord(
        jnp.stack([gx, gy], axis=-1), jnp.asarray(matrices), cfg, dyn,
        (OW / 2.0, OH / 2.0), (jnp.float32(out_f[0]), jnp.float32(out_f[1])))
    got_uv = np.asarray(got_uv)
    got_valid = np.asarray(got_valid)
    want_valid = ~np.isnan(want_uv[..., 0])
    agree = got_valid == want_valid
    assert agree.mean() > 0.999, f"validity disagreement {1-agree.mean():.4f}"
    both = got_valid & want_valid
    if both.any():
        uv_err = np.abs(got_uv[both] - want_uv[both]).max()
        assert uv_err < px_tol, f"uv deviation {uv_err}px (budget 0.5)"
    return got, want


class TestGoldenRemap:
    def test_bilinear_global_rotation(self):
        img = make_image()
        compare(*make_pair(), img=img)

    def test_bicubic(self):
        img = make_image()
        compare(*make_pair(interpolation=4), img=img)

    def test_lanczos4(self):
        img = make_image()
        compare(*make_pair(interpolation=8), img=img)

    def test_rgba(self):
        img = make_image(c=4)
        compare(*make_pair(), img=img)

    def test_bg_repeat(self):
        img = make_image()
        compare(*make_pair(background_mode=1, fov=1.4), img=img)

    def test_bg_mirror(self):
        img = make_image()
        compare(*make_pair(background_mode=2, fov=1.4), img=img)

    def test_bg_margin_feather(self):
        img = make_image()
        compare(*make_pair(background_mode=3, fov=1.2), img=img)

    def test_lens_correction_blend(self):
        img = make_image()
        compare(*make_pair(lens_correction_amount=0.5), img=img)

    def test_rolling_shutter_per_row(self):
        img = make_image()
        rotations = [(0.02 + 0.0006 * i, -0.03 + 0.0004 * i, 0.01) for i in range(H)]
        compare(*make_pair(rotations=rotations), img=img)

    def test_rolling_shutter_horizontal(self):
        img = make_image()
        rotations = [(0.02, -0.03 + 0.0004 * i, 0.01 + 0.0002 * i) for i in range(W)]
        compare(*make_pair(rotations=rotations, flags=HORIZONTAL_RS), img=img)

    def test_underwater_refraction(self):
        img = make_image()
        compare(*make_pair(flags=ANY_UNDERWATER, lrc=1.33), img=img)

    def test_refraction_with_lens_correction(self):
        img = make_image()
        compare(*make_pair(flags=ANY_UNDERWATER, lrc=1.33, lens_correction_amount=0.3), img=img)

    def test_digital_stretch(self):
        img = make_image()
        compare(*make_pair(digital_lens="digital_stretch",
                           digital_lens_params=[1.3333, 1.0]), img=img)

    def test_digital_superview_with_lens_correction(self):
        img = make_image()
        compare(*make_pair(digital_lens="gopro_superview", lens_correction_amount=0.4), img=img)

    def test_translation2d(self):
        img = make_image()
        compare(*make_pair(translation2d=(2.5, -1.75)), img=img)

    def test_fill_with_background(self):
        img = make_image()
        cfg, dyn, p, matrices = make_pair(flags=FILL_WITH_BACKGROUND)
        got = np.asarray(remap.remap_plane_jit(jnp.asarray(img), jnp.asarray(matrices), cfg, dyn))
        want = oracle.undistort_image(img, p, matrices)
        assert np.abs(got - want).max() < 1e-3

    def test_fix_color_range(self):
        img = make_image(c=1)
        compare(*make_pair(flags=FIX_COLOR_RANGE), img=img)

    def test_input_rotation(self):
        img = make_image()
        compare(*make_pair(input_rotation=90.0), img=img)

    def test_r_limit(self):
        img = make_image()
        cfg, dyn, p, matrices = make_pair(fov=1.3)
        dyn = dyn._replace(r_limit=jnp.float32(1.1))
        p["r_limit"] = 1.1
        compare(cfg, dyn, p, matrices, img=img)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestEWA:
    @pytest.mark.parametrize("interp", [10, 11, 12, 13])
    def test_ewa_modes(self, interp):
        from gyroflow_tpu.ops.remap import ewa_coeffs
        img = make_image()
        cfg, dyn, p, matrices = make_pair()
        cfg = cfg._replace(interpolation=interp)
        pw, qw = ewa_coeffs(interp)
        dyn = dyn._replace(ewa_coeffs_p=jnp.asarray(pw, jnp.float32),
                           ewa_coeffs_q=jnp.asarray(qw, jnp.float32))
        p.update(interpolation=interp, ewa_coeffs_p=list(pw), ewa_coeffs_q=list(qw))
        got = np.asarray(remap.remap_plane_jit(jnp.asarray(img), jnp.asarray(matrices), cfg, dyn))
        want = oracle.undistort_image(img, p, matrices)
        diff = np.abs(got - want)
        assert diff.max() < 1.0, f"EWA {interp} diff {diff.max()}"

    def test_ewa_feather_mode(self):
        from gyroflow_tpu.ops.remap import ewa_coeffs
        img = make_image()
        cfg, dyn, p, matrices = make_pair(background_mode=3, fov=1.2)
        cfg = cfg._replace(interpolation=13)
        pw, qw = ewa_coeffs(13)
        dyn = dyn._replace(ewa_coeffs_p=jnp.asarray(pw, jnp.float32),
                           ewa_coeffs_q=jnp.asarray(qw, jnp.float32))
        p.update(interpolation=13, ewa_coeffs_p=list(pw), ewa_coeffs_q=list(qw))
        got = np.asarray(remap.remap_plane_jit(jnp.asarray(img), jnp.asarray(matrices), cfg, dyn))
        want = oracle.undistort_image(img, p, matrices)
        assert np.abs(got - want).max() < 1.5


class TestEWAPallas:
    """EWA through the Pallas elliptical kernel vs oracle + XLA path."""

    @pytest.mark.parametrize("interp", [10, 11, 12, 13])
    def test_matches_xla(self, interp):
        img = make_image()
        cfg, dyn, p, matrices = make_pair()
        from gyroflow_tpu.ops.remap import ewa_coeffs
        pq, qq = ewa_coeffs(interp)
        cfg = cfg._replace(interpolation=interp)
        dyn = dyn._replace(ewa_coeffs_p=jnp.asarray(pq, jnp.float32),
                           ewa_coeffs_q=jnp.asarray(qq, jnp.float32))
        xla = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn))
        pal, ov = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn,
            win_h=64, win_w=512)
        assert not bool(ov)
        diff = np.abs(np.asarray(pal) - xla)
        assert diff.max() < 1.0, (interp, diff.max())

    @pytest.mark.parametrize("wincfg", [
        dict(win_h=64, win_w=512),                               # classic
        dict(win_h=40, win_w=256, win_k=128, win_r=24,
             tile_h=8, tile_w=96),                               # rolled rung
    ])
    def test_left_edge_clamp(self, wincfg):
        """Pixels whose EWA stencil starts LEFT/ABOVE the plane (window
        origin clipped to 0 -> negative tap-0 band column): the shared
        one-hot gather must anchor at the clamped column and weight by the
        absolute gathered coordinate (regression for the r3 band-space
        rewrite, which initially zeroed every tap for such pixels)."""
        img = make_image()
        cfg, dyn, p, matrices = make_pair()
        from gyroflow_tpu.ops.remap import ewa_coeffs
        pq, qq = ewa_coeffs(11)
        cfg = cfg._replace(interpolation=11)
        dyn = dyn._replace(ewa_coeffs_p=jnp.asarray(pq, jnp.float32),
                           ewa_coeffs_q=jnp.asarray(qq, jnp.float32))
        xla = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn))
        pal, ov = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn, **wincfg)
        assert not bool(ov)
        diff = np.abs(np.asarray(pal) - xla)
        # the make_pair geometry maps border tiles to source coords within
        # EWA_CAP of the plane edge, exercising the clamped gather anchor
        assert diff.max() < 1.0, diff.max()

    def test_oracle_golden(self):
        img = make_image()
        cfg, dyn, p, matrices = make_pair()
        from gyroflow_tpu.ops.remap import ewa_coeffs
        pq, qq = ewa_coeffs(11)
        cfg = cfg._replace(interpolation=11)
        dyn = dyn._replace(ewa_coeffs_p=jnp.asarray(pq, jnp.float32),
                           ewa_coeffs_q=jnp.asarray(qq, jnp.float32))
        p2 = dict(p)
        p2.update(interpolation=11, ewa_coeffs_p=list(pq), ewa_coeffs_q=list(qq))
        pal, ov = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn,
            win_h=64, win_w=512)
        assert not bool(ov)
        want = oracle.undistort_image(img, p2, matrices)
        diff = np.abs(np.asarray(pal) - want)
        assert np.percentile(diff, 99) < 2.0, np.percentile(diff, 99)

    def test_rs_jacobian_modes_golden(self):
        """Per-row-RS (multi-matrix) EWA vs the oracle in BOTH jacobian
        modes. Default (same-row): the ±eps finite-difference evals reuse
        the base pixel's RS matrix row — the true within-row derivative;
        max need stays ~2 so a tight full-image tolerance holds.
        ewa_ref_jac=True: literal cpu_undistort.rs:566-571 (each eval
        re-probes its own row); at ~1% of pixels the re-probed rint crosses
        a row boundary and the 1/eps-amplified jacobian spikes the reference
        bbox past the kernels' radius-4 stencil (documented truncation,
        STATUS.md), so that comparison uses a p99 tolerance."""
        img = make_image()
        rotations = [(0.02 + 0.002 * i, -0.03 + 0.0015 * i, 0.01 - 0.001 * i)
                     for i in range(H)]
        cfg, dyn, p, matrices = make_pair(rotations=rotations)
        from gyroflow_tpu.ops.remap import ewa_coeffs
        pq, qq = ewa_coeffs(11)
        dyn = dyn._replace(ewa_coeffs_p=jnp.asarray(pq, jnp.float32),
                           ewa_coeffs_q=jnp.asarray(qq, jnp.float32))
        p.update(interpolation=11, ewa_coeffs_p=list(pq),
                 ewa_coeffs_q=list(qq))

        cfg_s = cfg._replace(interpolation=11)
        pal, ov = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg_s, dyn,
            win_h=64, win_w=512)
        assert not bool(ov)
        want = oracle.undistort_image(img, p, matrices)
        d = np.abs(np.asarray(pal) - want)
        assert d.max() < 1.5, d.max()

        cfg_r = cfg_s._replace(ewa_ref_jac=True)
        p_r = dict(p)
        p_r["ewa_ref_jac"] = True
        pal_r, ov_r = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg_r, dyn,
            win_h=64, win_w=512)
        assert not bool(ov_r)
        want_r = oracle.undistort_image(img, p_r, matrices)
        d_r = np.abs(np.asarray(pal_r) - want_r)
        assert np.percentile(d_r, 99) < 2.0, np.percentile(d_r, 99)
        # the XLA fallback path must implement the same mode switch
        xla_r = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(matrices), cfg_r, dyn))
        xla_s = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(matrices), cfg_s, dyn))
        assert np.abs(xla_s - np.asarray(pal)).max() < 1.0
        assert np.abs(xla_r - np.asarray(pal_r)).max() < 1.0

    def test_dynamic_cap_parity_and_escalation(self):
        """ewa_cap rungs (parallel.pipeline.EWA_WINDOW_LADDER[...,-1]):
        a cap that covers the jac-derived reference bbox computes the same
        tap set as the old fixed cap 4 — outputs agree to f32 reassociation
        (the nonzero taps sit at different offsets inside the reduction
        trees, so sums regroup; measured <= 1e-3 of a code) — and a cap
        that truncates the bbox must raise the overflow flag so the
        manager's ladder escalates (cpu_undistort.rs:272-277 dynamic-bbox
        semantics, ladder-quantized)."""
        img = make_image()
        from gyroflow_tpu.ops.remap import ewa_coeffs
        pq, qq = ewa_coeffs(11)

        # mild geometry: |jac| <= 1 -> bbox radius exactly 2 -> cap 2 covers
        cfg, dyn, p, matrices = make_pair(fov=0.9)
        cfg = cfg._replace(interpolation=11)
        dyn = dyn._replace(ewa_coeffs_p=jnp.asarray(pq, jnp.float32),
                           ewa_coeffs_q=jnp.asarray(qq, jnp.float32))
        ref4, ov4 = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn,
            win_h=64, win_w=512, ewa_cap=4)
        got2, ov2 = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn,
            win_h=64, win_w=512, ewa_cap=2)
        # asymmetric rung (the per-row-RS shape: short X loop, legacy Y)
        gota, ova = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(matrices), cfg, dyn,
            win_h=64, win_w=512, ewa_cap=2, ewa_cap_y=4)
        assert not bool(ov4) and not bool(ov2) and not bool(ova)
        r4 = np.asarray(ref4)
        for got in (got2, gota):
            g = np.asarray(got)
            assert np.isfinite(r4).all() and np.isfinite(g).all()
            d = np.abs(r4 - g)
            assert d.max() <= 1e-2, d.max()

        # strong minification: fov >> 1 widens the source-per-output jac
        # beyond radius 2 -> the cap-2 kernel MUST flag overflow
        cfg_m, dyn_m, _, mats_m = make_pair(fov=2.5)
        cfg_m = cfg_m._replace(interpolation=11)
        dyn_m = dyn_m._replace(ewa_coeffs_p=jnp.asarray(pq, jnp.float32),
                               ewa_coeffs_q=jnp.asarray(qq, jnp.float32))
        _, ov_small = remap.remap_plane_pallas(
            jnp.asarray(img), jnp.asarray(mats_m), cfg_m, dyn_m,
            win_h=64, win_w=512, ewa_cap=2)
        assert bool(ov_small), "cap-2 must overflow on a radius>2 bbox"

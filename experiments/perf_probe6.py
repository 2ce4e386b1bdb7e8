"""Probe 6: matmul precision in the kernels — error + cost of fixes.

a) coords kernel: u,v TPU-vs-CPU error today (bf16 default); hi/lo 2-pass fix.
b) rolled sampler: DEFAULT vs HIGH vs manual 3-pass: time + error.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe6.py
"""
import json
import math

import numpy as np

from perf_probe import make_matrices, timed

SUBLANE, LANE = 8, 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gyroflow_tpu.ops import pallas_sampler as ps
    from gyroflow_tpu.ops import pallas_coords as pc
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.interpolation import INTER_BITS, INTER_TAB_SIZE
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    rng = np.random.default_rng(0)
    results = {}

    W, H = 3840, 2160
    f = (W * 0.62, W * 0.62)
    fov = 0.92
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=8, distortion_model="opencv_fisheye",
                       plane_index=0, flags=FIX_COLOR_RANGE)
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2), k=[0.25, -0.07, 0.02, -0.003],
                              fov=fov, max_pixel_value=1023.0,
                              pixel_value_limit=1023.0, background=(0, 0, 0, 1))
    img = jnp.asarray(rng.uniform(0, 1023, (H, W, 1)).astype(np.float32))
    mats = jnp.asarray(make_matrices(W, H, f, fov, H))

    TILE_H, TILE_W = 16, 128
    P = TILE_H * TILE_W
    spec = ps.SamplerSpec.create(height=H, width=W, out_height=H, out_width=W,
                                 interpolation=8, tile_h=TILE_H, win_h=48, win_w=256)
    ntiles = spec.grid[0] * spec.grid[1]

    # ---- a) coords TPU-vs-reference error ---------------------------------
    ox, oy, pad_ok = ps.tiled_grid(spec)
    out_pos = jnp.stack([ox, oy], axis=-1)
    factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
    out_c = (W / 2.0, H / 2.0)
    out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)

    @jax.jit
    def pre(img, mats):
        x, y, idx, _ = remap.coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
        return x, y, idx

    x, y, idx = jax.block_until_ready(pre(img, mats))

    u_k, v_k, valid_k, _ = pc.project_tiles(
        cfg, dyn, mats, x.reshape(ntiles, 1, P), y.reshape(ntiles, 1, P),
        idx.reshape(ntiles, 1, P))
    # XLA reference path (exact f32 gather)
    uv_ref, valid_ref = remap.rotate_and_distort(
        jnp.stack([x, y], axis=-1), idx, mats, cfg, dyn)
    du = jnp.abs(u_k.reshape(ntiles, P) - uv_ref[..., 0])
    dv = jnp.abs(v_k.reshape(ntiles, P) - uv_ref[..., 1])
    m = (valid_k.reshape(ntiles, P) > 0.5) & valid_ref
    err_u = float(jnp.max(jnp.where(m, du, 0.0)))
    err_v = float(jnp.max(jnp.where(m, dv, 0.0)))
    results["coords kernel err px (default/bf16)"] = (round(err_u, 4), round(err_v, 4))
    print("coords err px:", err_u, err_v, flush=True)

    # ---- b) rolled sampler precision variants ------------------------------
    TILE_W2 = 96
    ny2, nx2 = -(-H // TILE_H), -(-W // TILE_W2)
    nt2 = ny2 * nx2
    P2 = TILE_H * TILE_W2
    Sr, Sc, WIN_K = 48, 256, 128
    taps, offset = 8, 3.0

    t_ids = jnp.arange(nt2, dtype=jnp.int32)[:, None]
    p_ids = jnp.arange(P2, dtype=jnp.int32)[None, :]
    oy2 = (t_ids // nx2) * TILE_H + p_ids // TILE_W2
    ox2 = (t_ids % nx2) * TILE_W2 + p_ids % TILE_W2
    pad_ok2 = (ox2 < W) & (oy2 < H)
    out_pos2 = jnp.stack([ox2.astype(jnp.float32), oy2.astype(jnp.float32)], axis=-1)

    @jax.jit
    def make_uv2(img, mats):
        x, y, idx, _ = remap.coords_pre(out_pos2, mats, cfg, dyn, out_c, out_f)
        u_t, v_t, valid_t, ov = pc.project_tiles(
            cfg, dyn, mats, x.reshape(nt2, 1, P2), y.reshape(nt2, 1, P2),
            idx.reshape(nt2, 1, P2))
        u = u_t.reshape(nt2, P2)
        v = v_t.reshape(nt2, P2)
        valid = (valid_t.reshape(nt2, P2) > 0.5) & pad_ok2
        uu, vv = remap.coords_post_uv(u, v, cfg)
        return uu, vv, valid

    u_t, v_t, valid_t = jax.block_until_ready(make_uv2(img, mats))
    u_t = ps._guard_uv(u_t)
    v_t = ps._guard_uv(v_t)

    pheight = -(-H // SUBLANE) * SUBLANE
    pwidth = -(-W // LANE) * LANE

    @jax.jit
    def plan(u_t, v_t, valid_t):
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
        xf = (jnp.floor(umin - offset).astype(jnp.int32) - 1) & ~(SUBLANE - 1)
        x0 = xf & ~(LANE - 1)
        y0 = (jnp.floor(vmin - offset).astype(jnp.int32) - 1) & ~(SUBLANE - 1)
        x0 = jnp.clip(x0, 0, max(pwidth - Sc, 0))
        y0 = jnp.clip(y0, 0, max(pheight - Sr, 0))
        xf = jnp.clip(xf, x0, x0 + Sc - 8)
        xoff = xf - x0
        xlast = jnp.minimum(jnp.floor(umax - offset).astype(jnp.int32) + taps, W - 1)
        ylast = jnp.minimum(jnp.floor(vmax - offset).astype(jnp.int32) + taps, H - 1)
        overflow = (((xlast - xf >= WIN_K) | (ylast - y0 >= Sr)) & any_valid)
        return y0, x0, xoff, overflow.any()

    y0s, x0s, xoffs, ov = jax.block_until_ready(plan(u_t, v_t, valid_t))
    print("rolled overflow:", bool(ov), flush=True)

    imgs = jnp.moveaxis(img, -1, 0)
    imgs = jnp.pad(imgs, ((0, 0), (0, pheight - H), (0, pwidth - W)))
    bg = jnp.zeros((1, 1))

    def make_kern(mode):
        def kern(y0_ref, x0_ref, xoff_ref, img_ref, u_ref, v_ref, bg_ref,
                 out_ref, win_ref, sem):
            t = pl.program_id(0)
            y0 = pl.multiple_of(y0_ref[t], SUBLANE)
            x0 = pl.multiple_of(x0_ref[t], LANE)
            xoff = pl.multiple_of(xoff_ref[t], SUBLANE)
            cp = pltpu.make_async_copy(
                img_ref.at[:, pl.ds(y0, Sr), pl.ds(x0, Sc)], win_ref, sem)
            cp.start()
            u = u_ref[0] - offset
            v = v_ref[0] - offset
            sx0 = jnp.rint(u * INTER_TAB_SIZE).astype(jnp.int32)
            sy0 = jnp.rint(v * INTER_TAB_SIZE).astype(jnp.int32)
            fx = sx0 >> INTER_BITS
            fy = sy0 >> INTER_BITS
            phx = sx0 & (INTER_TAB_SIZE - 1)
            phy = sy0 & (INTER_TAB_SIZE - 1)
            wx = ps._WEIGHT_FNS[8](phx)
            wy = ps._WEIGHT_FNS[8](phy)
            fx_rel = fx - x0 - xoff
            fy_rel = fy - y0

            def tap_tree(T, ws):
                level = list(ws)
                bit = 0
                while len(level) > 1:
                    b = (T >> bit) & 1
                    level = [jnp.where(b == 1, level[i + 1], level[i])
                             for i in range(0, len(level), 2)]
                    bit += 1
                return jnp.where((T >= 0) & (T < len(ws)), level[0], 0.0)

            def build8(S, rel, ws):
                nb = S // 8
                fH = rel >> 3
                s = rel & 7
                cL = jax.lax.broadcasted_iota(jnp.int32, (8, P2), 0)
                U = tap_tree(cL - s, ws)
                V = tap_tree(cL + (8 - s), ws)
                bH = jax.lax.broadcasted_iota(jnp.int32, (nb, P2), 0)
                A0 = jax.lax.broadcast_in_dim(bH == fH, (nb, 8, P2), (0, 2)).reshape(S, P2)
                A1 = jax.lax.broadcast_in_dim(bH == fH + 1, (nb, 8, P2), (0, 2)).reshape(S, P2)
                Ue = jax.lax.broadcast_in_dim(U, (nb, 8, P2), (1, 2)).reshape(S, P2)
                Ve = jax.lax.broadcast_in_dim(V, (nb, 8, P2), (1, 2)).reshape(S, P2)
                return jnp.where(A0, Ue, jnp.where(A1, Ve, 0.0))

            wxm, csum = [], jnp.zeros((1, P2), jnp.float32)
            for t_ in range(taps):
                ok = ((fx + t_ >= 0) & (fx + t_ < W)).astype(jnp.float32)
                w = wx[t_] * ok
                wxm.append(w)
                csum = csum + w
            C = build8(WIN_K, fx_rel, wxm)
            wym, rsum = [], jnp.zeros((1, P2), jnp.float32)
            for t_ in range(taps):
                ok = ((fy + t_ >= 0) & (fy + t_ < H)).astype(jnp.float32)
                w = wy[t_] * ok
                wym.append(w)
                rsum = rsum + w
            R = build8(Sr, fy_rel, wym)
            cp.wait()
            bg_weight = 1.0 - rsum * csum
            rolled = pltpu.roll(win_ref[0], (Sc - xoff) % Sc, 1)
            wk = rolled[:, :WIN_K]
            if mode == "default":
                colmix = jnp.dot(wk, C, preferred_element_type=jnp.float32)
            elif mode == "high":
                colmix = jax.lax.dot_general(
                    wk, C, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGH)
            elif mode == "highest":
                colmix = jax.lax.dot_general(
                    wk, C, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            elif mode == "manual3":
                wk_hi = wk.astype(jnp.bfloat16).astype(jnp.float32)
                wk_lo = wk - wk_hi
                C_hi = C.astype(jnp.bfloat16).astype(jnp.float32)
                C_lo = C - C_hi
                colmix = (jnp.dot(wk_hi, C_hi, preferred_element_type=jnp.float32)
                          + jnp.dot(wk_lo, C_hi, preferred_element_type=jnp.float32)
                          + jnp.dot(wk_hi, C_lo, preferred_element_type=jnp.float32))
            sampled = jnp.sum(R * colmix, axis=0, keepdims=True)
            out_ref[0, 0] = (sampled + bg_weight * bg_ref[0, 0])[0]
        return kern

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(nt2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 1, P2), lambda i, *_: (i, 0, 0)),
                  pl.BlockSpec((1, 1, P2), lambda i, *_: (i, 0, 0)),
                  pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, P2), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((1, Sr, Sc), jnp.float32), pltpu.SemaphoreType.DMA])

    # XLA exact reference for error measurement
    dyn_ref = dyn._replace(pixel_value_limit=jnp.float32(1e30)) if hasattr(dyn, "_replace") else dyn
    ref = remap.sample_input(img, jnp.stack([u_t[:64], v_t[:64]], -1), jnp.zeros(1), cfg, dyn)

    for mode in ("default", "high", "highest", "manual3"):
        try:
            fcall = pl.pallas_call(
                make_kern(mode),
                out_shape=jax.ShapeDtypeStruct((nt2, 1, P2), jnp.float32),
                grid_spec=grid_spec)

            out = jax.block_until_ready(
                fcall(y0s, x0s, xoffs, imgs, u_t.reshape(nt2, 1, P2),
                      v_t.reshape(nt2, 1, P2), bg))
            got = jnp.minimum(jnp.moveaxis(out[:64], 1, -1), 1023.0)
            refc = jnp.minimum(ref, 1023.0)
            err = float(jnp.max(jnp.abs(jnp.where(valid_t[:64][..., None], got - refc, 0.0))))

            @jax.jit
            def run(im, salt, _f=fcall):
                o = _f(y0s, x0s, xoffs, im + salt,
                       u_t.reshape(nt2, 1, P2), v_t.reshape(nt2, 1, P2), bg)
                return jnp.sum(o) + salt

            ms = timed(run, imgs)
            results[f"sampler {mode}"] = {"ms": round(ms, 3), "err": round(err, 4)}
        except Exception as e:
            results[f"sampler {mode}"] = f"ERR {str(e)[:200]}"
        print("sampler", mode, "->", results[f"sampler {mode}"], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

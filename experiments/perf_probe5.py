"""Probe 5: rolled-window sampler — DMA stays 128-aligned/256-wide, but the
kernel rolls the band to lane 0 and computes with K=128 (tile_w=96, span<=119).
Expected: matmul passes halve, C build halves.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe5.py
"""
import functools
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

    for plane_name, (W, H, pi, kc) in (("Y", (3840, 2160, 0, 1)),
                                       ("UV", (1920, 1080, 1, 2))):
        f = (W * 0.62, W * 0.62)
        fov = 0.92
        cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                           interpolation=8, distortion_model="opencv_fisheye",
                           plane_index=pi, flags=FIX_COLOR_RANGE)
        dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2), k=[0.25, -0.07, 0.02, -0.003],
                                  fov=fov, max_pixel_value=1023.0,
                                  pixel_value_limit=1023.0, background=(0, 0, 0, 1))
        img = jnp.asarray(rng.uniform(0, 1023, (H, W, kc)).astype(np.float32))
        mats = jnp.asarray(make_matrices(W, H, f, fov, H))

        TILE_H, TILE_W = 16, 96
        WIN_H = 48 if plane_name == "Y" else 40
        WIN_W, WIN_K = 256, 128
        P = TILE_H * TILE_W
        ny, nx = -(-H // TILE_H), -(-W // TILE_W)
        ntiles = ny * nx
        Sr, Sc = WIN_H, WIN_W
        taps, offset = 8, 3.0

        # ---- coords in tiled (16,96) layout --------------------------------
        t_ids = jnp.arange(ntiles, dtype=jnp.int32)[:, None]
        p_ids = jnp.arange(P, dtype=jnp.int32)[None, :]
        oy = (t_ids // nx) * TILE_H + p_ids // TILE_W
        ox = (t_ids % nx) * TILE_W + p_ids % TILE_W
        pad_ok = (ox < W) & (oy < H)
        out_pos = jnp.stack([ox.astype(jnp.float32), oy.astype(jnp.float32)], axis=-1)

        @jax.jit
        def make_uv(img, mats):
            factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
            out_c = (W / 2.0, H / 2.0)
            out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)
            x, y, idx, _ = remap.coords_pre(out_pos, mats, cfg, dyn, out_c, out_f)
            nt = x.shape[0]
            u_t, v_t, valid_t, ov = pc.project_tiles(
                cfg, dyn, mats, x.reshape(nt, 1, P), y.reshape(nt, 1, P),
                idx.reshape(nt, 1, P))
            u = u_t.reshape(nt, P)
            v = v_t.reshape(nt, P)
            valid = (valid_t.reshape(nt, P) > 0.5) & pad_ok
            uu, vv = remap.coords_post_uv(u, v, cfg)
            return uu, vv, valid

        u_t, v_t, valid_t = jax.block_until_ready(make_uv(img, mats))
        u_t = ps._guard_uv(u_t)
        v_t = ps._guard_uv(v_t)

        # ---- window planning with fine origins ------------------------------
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
            x0 = jnp.clip(x0, 0, max(pwidth - WIN_W, 0))
            y0 = jnp.clip(y0, 0, max(pheight - WIN_H, 0))
            xf = jnp.clip(xf, x0, x0 + WIN_W - 8)
            xoff = xf - x0
            xlast = jnp.minimum(jnp.floor(umax - offset).astype(jnp.int32) + taps, W - 1)
            ylast = jnp.minimum(jnp.floor(vmax - offset).astype(jnp.int32) + taps, H - 1)
            overflow = (((xlast - xf >= WIN_K) | (ylast - y0 >= WIN_H)) & any_valid)
            return y0, x0, xoff, overflow.any()

        y0s, x0s, xoffs, ov = jax.block_until_ready(plan(u_t, v_t, valid_t))
        print(plane_name, "rolled-plan overflow:", bool(ov), flush=True)

        imgs = jnp.moveaxis(img, -1, 0)
        imgs = jnp.pad(imgs, ((0, 0), (0, pheight - H), (0, pwidth - W)))
        bg = jnp.zeros((1, kc))
        nchan = kc

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
                cL = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
                U = tap_tree(cL - s, ws)
                V = tap_tree(cL + (8 - s), ws)
                bH = jax.lax.broadcasted_iota(jnp.int32, (nb, P), 0)
                A0 = jax.lax.broadcast_in_dim(bH == fH, (nb, 8, P), (0, 2)).reshape(S, P)
                A1 = jax.lax.broadcast_in_dim(bH == fH + 1, (nb, 8, P), (0, 2)).reshape(S, P)
                Ue = jax.lax.broadcast_in_dim(U, (nb, 8, P), (1, 2)).reshape(S, P)
                Ve = jax.lax.broadcast_in_dim(V, (nb, 8, P), (1, 2)).reshape(S, P)
                return jnp.where(A0, Ue, jnp.where(A1, Ve, 0.0))

            wxm, csum = [], jnp.zeros((1, P), jnp.float32)
            for t_ in range(taps):
                ok = ((fx + t_ >= 0) & (fx + t_ < W)).astype(jnp.float32)
                w = wx[t_] * ok
                wxm.append(w)
                csum = csum + w
            C = build8(WIN_K, fx_rel, wxm)

            wym, rsum = [], jnp.zeros((1, P), jnp.float32)
            for t_ in range(taps):
                ok = ((fy + t_ >= 0) & (fy + t_ < H)).astype(jnp.float32)
                w = wy[t_] * ok
                wym.append(w)
                rsum = rsum + w
            R = build8(Sr, fy_rel, wym)

            cp.wait()
            bg_weight = 1.0 - rsum * csum
            for ch in range(nchan):
                rolled = pltpu.roll(win_ref[ch], (Sc - xoff) % Sc, 1)
                wk = rolled[:, :WIN_K]
                colmix = jnp.dot(wk, C, preferred_element_type=jnp.float32)
                sampled = jnp.sum(R * colmix, axis=0, keepdims=True)
                out_ref[0, ch] = (sampled + bg_weight * bg_ref[0, ch])[0]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, nchan), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, nchan, P), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((nchan, Sr, Sc), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        fcall = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ntiles, nchan, P), jnp.float32),
            grid_spec=grid_spec)

        @jax.jit
        def run_rolled(im, salt):
            o = fcall(y0s, x0s, xoffs, im + salt,
                      u_t.reshape(ntiles, 1, P), v_t.reshape(ntiles, 1, P), bg)
            return jnp.sum(o) + salt

        # correctness vs production sampler
        spec_base = ps.SamplerSpec.create(height=H, width=W, out_height=H, out_width=W,
                                          interpolation=8, tile_h=16, win_h=WIN_H,
                                          win_w=256)
        try:
            out_rolled = jax.block_until_ready(
                fcall(y0s, x0s, xoffs, imgs, u_t.reshape(ntiles, 1, P),
                      v_t.reshape(ntiles, 1, P), bg))
            # reference via XLA sample_input on a few tiles
            uv_ref = jnp.stack([u_t[:4], v_t[:4]], axis=-1)
            ref = remap.sample_input(img.astype(jnp.float32), uv_ref,
                                     jnp.zeros(kc), cfg, dyn)
            got = jnp.minimum(jnp.moveaxis(out_rolled[:4], 1, -1), 1023.0)
            ref = jnp.minimum(ref, 1023.0)
            vmask = valid_t[:4][..., None]
            err = jnp.max(jnp.abs(jnp.where(vmask, got - ref, 0.0)))
            results[f"{plane_name} max_err"] = float(err)
            print(plane_name, "max_err", float(err), flush=True)
            ms = timed(run_rolled, imgs)
            results[f"{plane_name} rolled"] = round(ms, 3)
        except Exception as e:
            results[f"{plane_name} rolled"] = f"ERR {str(e)[:300]}"
        print(plane_name, "rolled ->", results[f"{plane_name} rolled"], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

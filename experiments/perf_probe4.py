"""Probe 4: sampler cost split + double-buffered window prefetch variant.

Variants (Y plane 4K, t16, win 48x256, lanczos4):
  base        - current production kernel
  noop        - DMA window + write constant (isolates DMA + fixed overhead)
  nobuild     - constant C/R (isolates matmul + DMA + overhead)
  nomatmul    - builds only, cheap output (isolates build cost)
  dbuf        - double-buffered cross-step window prefetch (candidate)

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe4.py
"""
import functools
import json
import math

import numpy as np

from perf_probe import make_matrices, timed


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gyroflow_tpu.ops import pallas_sampler as ps
    from gyroflow_tpu.ops import pallas_coords as pc
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    rng = np.random.default_rng(0)
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

    TILE_H = 16
    WIN = (48, 256)
    spec = ps.SamplerSpec.create(height=H, width=W, out_height=H, out_width=W,
                                 interpolation=8, tile_h=TILE_H,
                                 win_h=WIN[0], win_w=WIN[1])
    P = spec.tile_h * spec.tile_w
    Sr, Sc = spec.win_h, spec.win_w

    # precompute uv tiles once
    @jax.jit
    def make_uv(img, mats, _spec=spec):
        ox, oy, pad_ok = ps.tiled_grid(_spec)
        out_pos = jnp.stack([ox, oy], axis=-1)
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
    y0s, x0s, _xo, _yo, _ = jax.block_until_ready(ps.plan_windows_t(spec, u_t, v_t, valid_t))
    imgs = jnp.moveaxis(img, -1, 0)
    imgs_p = ps._pad_imgs(spec, imgs)
    bg = jnp.zeros((1, 1))
    ntiles = u_t.shape[0]
    results = {}

    def run_call(kernel_fn, extra_scratch=None, name="x"):
        scratch = [pltpu.VMEM((1, Sr, Sc), jnp.float32), pltpu.SemaphoreType.DMA]
        if extra_scratch is not None:
            scratch = extra_scratch
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0)),
            scratch_shapes=scratch,
        )
        f_call = pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct((ntiles, 1, P), jnp.float32),
            grid_spec=grid_spec)

        @jax.jit
        def run(im, salt):
            o = f_call(y0s, x0s, im + salt,
                       u_t.reshape(ntiles, 1, P), v_t.reshape(ntiles, 1, P), bg)
            return jnp.sum(o) + salt

        try:
            ms = timed(run, imgs_p)
            results[name] = round(ms, 3)
        except Exception as e:
            results[name] = f"ERR {str(e)[:200]}"
        print(name, "->", results[name], flush=True)

    taps = 8
    offset = spec.offset
    from gyroflow_tpu.ops.interpolation import INTER_BITS, INTER_TAB_SIZE

    def common_build(u_ref, v_ref):
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
        return fx, fy, wx, wy

    def k_noop(y0_ref, x0_ref, img_ref, u_ref, v_ref, bg_ref, out_ref, win_ref, sem):
        t = pl.program_id(0)
        y0 = pl.multiple_of(y0_ref[t], 8)
        x0 = pl.multiple_of(x0_ref[t], 128)
        cp = pltpu.make_async_copy(img_ref.at[:, pl.ds(y0, Sr), pl.ds(x0, Sc)], win_ref, sem)
        cp.start()
        cp.wait()
        out_ref[0, 0] = win_ref[0, 0, 0] + u_ref[0][0]

    def k_nobuild(y0_ref, x0_ref, img_ref, u_ref, v_ref, bg_ref, out_ref, win_ref, sem):
        t = pl.program_id(0)
        y0 = pl.multiple_of(y0_ref[t], 8)
        x0 = pl.multiple_of(x0_ref[t], 128)
        cp = pltpu.make_async_copy(img_ref.at[:, pl.ds(y0, Sr), pl.ds(x0, Sc)], win_ref, sem)
        cp.start()
        u = u_ref[0]
        # fake C/R from iota-based broadcast (cheap, not per-tap)
        C = jax.lax.broadcasted_iota(jnp.float32, (Sc, P), 0) * 1e-6 + u * 1e-9
        R = jax.lax.broadcasted_iota(jnp.float32, (Sr, P), 0) * 1e-6
        cp.wait()
        colmix = jnp.dot(win_ref[0], C, preferred_element_type=jnp.float32)
        out_ref[0, 0] = jnp.sum(R * colmix, axis=0, keepdims=True)[0]

    def k_nomatmul(y0_ref, x0_ref, img_ref, u_ref, v_ref, bg_ref, out_ref, win_ref, sem):
        t = pl.program_id(0)
        y0 = pl.multiple_of(y0_ref[t], 8)
        x0 = pl.multiple_of(x0_ref[t], 128)
        cp = pltpu.make_async_copy(img_ref.at[:, pl.ds(y0, Sr), pl.ds(x0, Sc)], win_ref, sem)
        cp.start()
        fx, fy, wx, wy = common_build(u_ref, v_ref)
        fx_rel = fx - x0
        fy_rel = fy - y0
        wxm, csum = [], jnp.zeros((1, P), jnp.float32)
        for t_ in range(taps):
            ok = ((fx + t_ >= 0) & (fx + t_ < W)).astype(jnp.float32)
            w = wx[t_] * ok
            wxm.append(w)
            csum = csum + w
        C = ps._sampler_kernel.__wrapped__ if False else None
        # reuse module helpers via closure trick: inline blocked build
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

        C = build8(Sc, fx_rel, wxm)
        wym, rsum = [], jnp.zeros((1, P), jnp.float32)
        for t_ in range(taps):
            ok = ((fy + t_ >= 0) & (fy + t_ < H)).astype(jnp.float32)
            w = wy[t_] * ok
            wym.append(w)
            rsum = rsum + w
        R = build8(Sr, fy_rel, wym)
        cp.wait()
        out_ref[0, 0] = (jnp.sum(C[0:1] * 1e-6, axis=0, keepdims=True) +
                         jnp.sum(R[0:1], axis=0, keepdims=True) +
                         win_ref[0, 0, 0] + csum + rsum)[0]

    # ---- double-buffered full kernel --------------------------------------
    def k_dbuf(y0_ref, x0_ref, img_ref, u_ref, v_ref, bg_ref, out_ref, win_ref, sem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)

        def dma(slot, tile):
            y0 = pl.multiple_of(y0_ref[tile], 8)
            x0 = pl.multiple_of(x0_ref[tile], 128)
            return pltpu.make_async_copy(
                img_ref.at[:, pl.ds(y0, Sr), pl.ds(x0, Sc)],
                win_ref.at[slot], sem.at[slot])

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _():
            dma(0, 0).start()

        @pl.when(t + 1 < nt)
        def _():
            dma(jax.lax.rem(t + 1, 2), t + 1).start()

        fx, fy, wx, wy = common_build(u_ref, v_ref)
        x0 = pl.multiple_of(x0_ref[t], 128)
        y0 = pl.multiple_of(y0_ref[t], 8)
        fx_rel = fx - x0
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
        C = build8(Sc, fx_rel, wxm)
        wym, rsum = [], jnp.zeros((1, P), jnp.float32)
        for t_ in range(taps):
            ok = ((fy + t_ >= 0) & (fy + t_ < H)).astype(jnp.float32)
            w = wy[t_] * ok
            wym.append(w)
            rsum = rsum + w
        R = build8(Sr, fy_rel, wym)

        dma(slot, t).wait()
        bg_weight = 1.0 - rsum * csum
        colmix = jnp.dot(win_ref[slot, 0], C, preferred_element_type=jnp.float32)
        sampled = jnp.sum(R * colmix, axis=0, keepdims=True)
        out_ref[0, 0] = (sampled + bg_weight * bg_ref[0, 0])[0]

    # base: production path
    @jax.jit
    def run_base(im, salt):
        out_t, ov = ps.sample_planes_t(spec, im + salt, u_t, v_t, valid_t, jnp.zeros(1))
        return jnp.sum(out_t) + salt

    results["base"] = round(timed(run_base, imgs), 3)
    print("base ->", results["base"], flush=True)

    run_call(k_noop, name="noop")
    run_call(k_nobuild, name="nobuild")
    run_call(k_nomatmul, name="nomatmul")
    run_call(k_dbuf,
             extra_scratch=[pltpu.VMEM((2, 1, Sr, Sc), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
             name="dbuf")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

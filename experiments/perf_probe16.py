"""Probe 16: decompose the rolled sampler kernel at 4K Y (th16/wh40/k128/tw96).

Monkeypatches ps._sampler_kernel with stripped variants:
  io        read u/v + write out (plus DMA waits; no builds/roll/matmul)
  builds    + the C and R one-hot builds (summed, no roll/matmul)
  roll      + the lane roll of the window
  colmix    + the 2-call M-stacked f32 colmix
  full      production (adds the row mix + bg blend)

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe16.py
"""
import json

import numpy as np

from perf_probe import make_matrices, timed


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gyroflow_tpu.ops import pallas_sampler as ps
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    SUBLANE, LANE = 8, 128
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

    orig = ps._sampler_kernel

    def make_variant(level):
        def kern(spec, G, y0_ref, x0_ref, xoff_ref, img_ref, u_ref, v_ref,
                 bg_ref, out_ref, win_ref, sems):
            Sr, Sc = spec.win_h, spec.win_w
            Kw = spec.kw
            nchan = win_ref.shape[1]
            taps = spec.taps
            P = spec.tile_h * spec.tile_w
            srx, sry, srw, srh = spec.src_rect
            g = pl.program_id(0)

            def win_dma(j):
                tile = g * G + j
                ty0 = pl.multiple_of(y0_ref[tile], SUBLANE)
                tx0 = pl.multiple_of(x0_ref[tile], LANE)
                return pltpu.make_async_copy(
                    img_ref.at[:, pl.ds(ty0, Sr), pl.ds(tx0, Sc)],
                    win_ref.at[j], sems.at[j])

            for j in range(G):
                win_dma(j).start()

            u = u_ref[0] - spec.offset
            v = v_ref[0] - spec.offset
            from gyroflow_tpu.ops.interpolation import INTER_BITS, INTER_TAB_SIZE
            sx0 = jnp.rint(u * INTER_TAB_SIZE).astype(jnp.int32)
            sy0 = jnp.rint(v * INTER_TAB_SIZE).astype(jnp.int32)
            fx = (sx0 >> INTER_BITS)
            fy = (sy0 >> INTER_BITS)
            phx = sx0 & (INTER_TAB_SIZE - 1)
            phy = sy0 & (INTER_TAB_SIZE - 1)
            wx = ps._WEIGHT_FNS[spec.interpolation](phx)
            wy = ps._WEIGHT_FNS[spec.interpolation](phy)
            wxm, csum = [], jnp.zeros_like(u)
            for t in range(taps):
                ok = ((fx + t >= srx) & (fx + t < srx + srw)).astype(jnp.float32)
                w = wx[t] * ok
                wxm.append(w)
                csum = csum + w
            wym, rsum = [], jnp.zeros_like(v)
            for t in range(taps):
                ok = ((fy + t >= sry) & (fy + t < sry + srh)).astype(jnp.float32)
                w = wy[t] * ok
                wym.append(w)
                rsum = rsum + w
            bg_weight = 1.0 - rsum * csum

            acc = None
            for j in range(G):
                tile = g * G + j
                y0 = pl.multiple_of(y0_ref[tile], SUBLANE)
                x0 = pl.multiple_of(x0_ref[tile], LANE)
                xoff = pl.multiple_of(xoff_ref[tile], SUBLANE)
                win_dma(j).wait()
                if level < 1:
                    s = win_ref[j, 0, 0:1, :1] * 0.0
                    continue
                fx_rel = fx[j:j + 1] - x0 - xoff
                fy_rel = fy[j:j + 1] - y0
                wxm_j = [w[j:j + 1] for w in wxm]
                wym_j = [w[j:j + 1] for w in wym]
                C = ps.build_onehot8_blocked_pub(Kw, fx_rel, wxm_j, P)
                R = ps.build_onehot8_blocked_pub(Sr, fy_rel, wym_j, P)
                if level == 1:
                    s = (jnp.sum(C, axis=0, keepdims=True)
                         + jnp.sum(R, axis=0, keepdims=True))
                    acc = s if acc is None else acc + s
                    continue
                win_all = win_ref[j].reshape(nchan * Sr, Sc)
                if Kw < Sc:
                    win_all = pltpu.roll(win_all, (Sc - xoff) % Sc, 1)[:, :Kw]
                if level == 2:
                    s = (win_all[0:1, :P] if Sc >= P else
                         jnp.sum(win_all, axis=0, keepdims=True)[:, :1] *
                         jnp.ones((1, P), jnp.float32))
                    s = jnp.sum(win_all, axis=0, keepdims=True)[:, :1] * \
                        jnp.ones((1, P), jnp.float32) + \
                        jnp.sum(C, axis=0, keepdims=True)
                    acc = s if acc is None else acc + s
                    continue
                colmix = ps._dot3(win_all, C)                # (C*Sr, P)
                s = jnp.sum(R * colmix[:Sr], axis=0, keepdims=True)
                acc = s if acc is None else acc + s

            if acc is not None:
                out_ref[0, 0] = jnp.broadcast_to(acc, (G, P)) + bg_weight * bg_ref[0, 0]
            else:
                out_ref[0, 0] = bg_weight * bg_ref[0, 0]
        return kern

    # expose the blocked builder for the variants
    def build_pub(S, rel, ws, P):
        import functools
        rid = None
        return ps_build(S, rel, ws, P)

    # reuse the kernel's internal builder by re-implementing the call through
    # a tiny shim module attribute
    def ps_build(S, rel, ws, P):
        import jax
        import jax.numpy as jnp

        def _tap_tree(T, ws):
            n = len(ws)
            level = list(ws)
            bit = 0
            while len(level) > 1:
                b = (T >> bit) & 1
                level = [jnp.where(b == 1, level[i + 1], level[i])
                         for i in range(0, len(level), 2)]
                bit += 1
            return jnp.where((T >= 0) & (T < n), level[0], 0.0)

        nb = S // 8
        fH = rel >> 3
        s = rel & 7
        cL = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
        U = _tap_tree(cL - s, ws)
        V = _tap_tree(cL + (8 - s), ws)
        bH = jax.lax.broadcasted_iota(jnp.int32, (nb, P), 0)
        A0 = jax.lax.broadcast_in_dim(bH == fH, (nb, 8, P), (0, 2)).reshape(S, P)
        A1 = jax.lax.broadcast_in_dim(bH == fH + 1, (nb, 8, P), (0, 2)).reshape(S, P)
        Ue = jax.lax.broadcast_in_dim(U, (nb, 8, P), (1, 2)).reshape(S, P)
        Ve = jax.lax.broadcast_in_dim(V, (nb, 8, P), (1, 2)).reshape(S, P)
        return jnp.where(A0, Ue, jnp.where(A1, Ve, 0.0))

    ps.build_onehot8_blocked_pub = ps_build

    def time_level(level, tag):
        ps._sample_call.clear_cache()
        if level is None:
            ps._sampler_kernel = orig
        else:
            ps._sampler_kernel = make_variant(level)

        @jax.jit
        def full(img, mats, salt):
            out, ov = remap.remap_plane_pallas(
                img + salt, mats, cfg, dyn, win_h=40, win_w=256, win_k=128,
                tile_h=16, tile_w=96)
            return jnp.sum(out)
        results[tag] = round(timed(full, img, mats), 3)
        print(tag, results[tag], flush=True)

    try:
        for level, tag in ((0, "io+dma"), (1, "builds"), (2, "roll"),
                           (3, "colmix"), (None, "full")):
            time_level(level, tag)
    finally:
        ps._sampler_kernel = orig
        ps._sample_call.clear_cache()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

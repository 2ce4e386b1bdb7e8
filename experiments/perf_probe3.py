"""Probe 3: what does the bench pick; can DMA slice at sub-128 lane offsets;
sampler cost split (matmul vs one-hot build); sublane-sliced coords variant.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe3.py
"""
import json
import math
import time

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

    results = {}

    # ---- 1. misaligned-lane DMA microbenchmark ----------------------------
    H, W = 2176, 3840
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1023, (1, H, W)).astype(np.float32))

    def make_win_kernel(align, Sr, Sc):
        def kern(y0_ref, x0_ref, img_ref, out_ref, win_ref, sem):
            t = pl.program_id(0)
            y0 = pl.multiple_of(y0_ref[t], 8)
            x0 = pl.multiple_of(x0_ref[t], align)
            cp = pltpu.make_async_copy(
                img_ref.at[:, pl.ds(y0, Sr), pl.ds(x0, Sc)], win_ref, sem)
            cp.start()
            cp.wait()
            out_ref[0, 0] = jnp.sum(win_ref[0], axis=0)
        return kern

    ntiles = 512
    rng = np.random.default_rng(1)

    for align, Sc in ((128, 256), (32, 256), (32, 160), (8, 160)):
        Sr = 48
        y0s = jnp.asarray((rng.integers(0, (H - Sr) // 8, ntiles) * 8).astype(np.int32))
        x0s = jnp.asarray((rng.integers(0, (W - Sc) // align, ntiles) * align).astype(np.int32))
        try:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(ntiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, 1, Sc), lambda i, *_: (i, 0, 0)),
                scratch_shapes=[pltpu.VMEM((1, Sr, Sc), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            )
            fn = pl.pallas_call(
                make_win_kernel(align, Sr, Sc),
                out_shape=jax.ShapeDtypeStruct((ntiles, 1, Sc), jnp.float32),
                grid_spec=grid_spec)

            @jax.jit
            def run(img, salt, _fn=fn, _y=y0s, _x=x0s):
                return jnp.sum(_fn(_y, _x, img + salt)) + salt

            ms = timed(run, img)
            results[f"dma align{align} Sc{Sc}"] = round(ms, 3)
        except Exception as e:
            results[f"dma align{align} Sc{Sc}"] = f"ERR {str(e)[:160]}"
        print(f"dma align{align} Sc{Sc}", "->", results[f"dma align{align} Sc{Sc}"], flush=True)

    # ---- 2. what windows does the bench pick? -----------------------------
    W4, H4 = 3840, 2160
    f = (W4 * 0.62, W4 * 0.62)
    fov = 0.92
    TILE_H = 16
    for name, (Wp, Hp, pi, kc) in {"Y": (3840, 2160, 0, 1), "UV": (1920, 1080, 1, 2)}.items():
        fp = (Wp * 0.62, Wp * 0.62)
        cfg = KernelConfig(width=Wp, height=Hp, output_width=Wp, output_height=Hp,
                           interpolation=8, distortion_model="opencv_fisheye",
                           plane_index=pi, flags=FIX_COLOR_RANGE)
        dyn = KernelDynamics.make(f=fp, c=(Wp / 2, Hp / 2), k=[0.25, -0.07, 0.02, -0.003],
                                  fov=fov, max_pixel_value=1023.0, pixel_value_limit=1023.0,
                                  background=(0, 0, 0, 1))
        img_p = jnp.asarray(np.random.default_rng(0).uniform(0, 1023, (Hp, Wp, kc)).astype(np.float32))
        mats = jnp.asarray(make_matrices(Wp, Hp, fp, fov, Hp))
        picked = None
        for cand in ((24, 256), (32, 256), (40, 256), (48, 256), (56, 256),
                     (64, 384), (96, 768)):
            if cand[0] < TILE_H + 8:
                continue
            out, ov = remap.remap_plane_pallas_jit(img_p, mats, cfg, dyn, None,
                                                   win_h=cand[0], win_w=cand[1],
                                                   tile_h=TILE_H)
            if not bool(ov):
                picked = cand
                break
        results[f"picked window {name}"] = picked
        print(f"picked window {name}", "->", picked, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

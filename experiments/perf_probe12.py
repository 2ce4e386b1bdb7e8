"""Probe 12: exact8 fast path — 4K Y plane, uint8 (2-pass colmix) vs f32
(3-pass) content through the full Pallas pipeline.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe12.py
"""
import numpy as np

from perf_probe import make_matrices, timed


def main():
    import jax
    import jax.numpy as jnp
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics

    rng = np.random.default_rng(0)
    W, H = 3840, 2160
    f = (W * 0.62, W * 0.62)
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=8, distortion_model="opencv_fisheye",
                       plane_index=0, flags=FIX_COLOR_RANGE)
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2), k=[0.25, -0.07, 0.02, -0.003],
                              fov=0.92, max_pixel_value=255.0,
                              pixel_value_limit=255.0, background=(0, 0, 0, 1))
    img8 = jnp.asarray(rng.integers(0, 256, (H, W, 1), dtype=np.uint8))
    imgf = img8.astype(jnp.float32)
    mats = jnp.asarray(make_matrices(W, H, f, 0.92, H))
    WIN = (24, 256, 128, 96)

    def run(img):
        @jax.jit
        def fn(img, mats, salt):
            out, _ = remap.remap_plane_pallas(
                img, mats, cfg, dyn, win_h=WIN[0], win_w=WIN[1], win_k=WIN[2],
                tile_w=WIN[3], tile_h=16)
            return jnp.sum(out) + salt
        return timed(fn, img, mats)

    print("f32   (3-pass colmix):", round(run(imgf), 3), "ms", flush=True)
    print("uint8 (2-pass colmix):", round(run(img8), 3), "ms", flush=True)


if __name__ == "__main__":
    main()

"""Time the EWA elliptical Pallas kernel at 1080p on the real chip.

  PYTHONPATH=/root/repo:/root/.axon_site python experiments/ewa_probe.py

History: round-1 ungrouped kernel = 22 ms/frame (1080p, interpolation 11);
round-3 per-tap-matmul kernel = 15.1 ms total step; round-3 band-space
rewrite (one M-stacked gather matmul + analytic full-sublane weights +
rolled win_k/win_r) = 10.7 ms at the production EWA_WINDOW_LADDER rung
(40, 256, 128, 96, 8, 24). This probe times the classic full-width window
(no rolls) — use /tmp-style sweeps or the ladder for production numbers.
"""
import time

import numpy as np

from perf_probe import make_matrices


def main():
    import jax
    import jax.numpy as jnp
    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import FIX_COLOR_RANGE, KernelConfig, KernelDynamics
    from gyroflow_tpu.ops.remap import ewa_coeffs

    rng = np.random.default_rng(0)
    W, H = 1920, 1080
    f = (W * 0.62, W * 0.62)
    cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                       interpolation=11, distortion_model="opencv_fisheye",
                       flags=FIX_COLOR_RANGE)
    pw, qw = ewa_coeffs(11)
    dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2), k=[0.25, -0.07, 0.02, -0.003],
                              fov=0.92, max_pixel_value=1023.0,
                              pixel_value_limit=1023.0, background=(0, 0, 0, 1),
                              ewa_coeffs_p=pw, ewa_coeffs_q=qw)
    img = jnp.asarray(rng.uniform(0, 1023.0, (H, W, 1)).astype(np.float32))
    mats = jnp.asarray(make_matrices(W, H, f, 0.92, 1))

    @jax.jit
    def run(img, mats, eps):
        out, ov = remap.remap_plane_pallas(img + eps, mats, cfg, dyn, None,
                                           win_h=48, win_w=384, tile_w=128)
        return jnp.sum(out)

    from perf_probe import timed
    ms = timed(run, img, mats)
    print(f"EWA 1080p interpolation=11: {ms:.2f} ms/frame")


if __name__ == "__main__":
    main()

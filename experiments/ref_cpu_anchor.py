"""Reference-CPU-path performance anchor (BASELINE.md "anchors to produce
ourselves", VERDICT r2 missing #7).

Rust/cargo is not available in this image, so the reference's CPU fallback
(cpu_undistort.rs:543-625, rayon over rows) cannot be compiled and timed
directly. `native/gyroflow_native.cpp ref_cpu_remap_anchor` is a C++
re-statement of the SAME per-pixel workload — RS center-matrix probe + row
matrix (two 3x3 homogeneous transforms), forward fisheye distort (atan +
8th-order polynomial), separable lanczos4 8x8 LUT sampling — compiled -O3
-march=native and threaded over rows like rayon. This script times it on the
bench geometry (4K 10-bit YUV420: 3840x2160 Y + 2x 1920x1080 chroma) and
prints per-core fps plus projections for common desktop core counts.

Run: python experiments/ref_cpu_anchor.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import make_matrices  # noqa: E402
from gyroflow_tpu import native  # noqa: E402


def time_plane(W, H, nthreads, reps=3):
    f = (W * 0.62, W * 0.62)
    fov = 0.92
    mats = make_matrices(W, H, f, fov, H)
    img = np.random.default_rng(0).uniform(0, 1023, (H, W)).astype(np.float32)
    params = np.array([f[0] / fov, f[1] / fov, W / 2, H / 2,
                       0.25, -0.07, 0.02, -0.003, 0.0, 0.0], np.float32)
    best = None
    for _ in range(reps):
        t0 = time.time()
        native.ref_cpu_remap_anchor(img, mats, params, nthreads)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    assert native.available(), "native library failed to build"
    ncores = os.cpu_count() or 1

    t_y = time_plane(3840, 2160, 1)
    t_c = time_plane(1920, 1080, 1)
    frame_s = t_y + 2.0 * t_c          # Y + U + V planes of 4K YUV420
    fps_1core = 1.0 / frame_s

    out = {
        "host": f"{ncores}-core Xeon 2.10GHz (this image)",
        "y_plane_s_per_frame_1core": round(t_y, 3),
        "chroma_plane_s_per_frame_1core": round(t_c, 3),
        "full_4k_yuv420_frame_s_1core": round(frame_s, 3),
        "ref_cpu_path_fps_1core": round(fps_1core, 3),
        "projected_fps_8core": round(8 * fps_1core, 2),
        "projected_fps_16core": round(16 * fps_1core, 2),
        "projected_fps_32core": round(32 * fps_1core, 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""Probe (round 4): where do the production path's 77 ms/frame go?

bench.py r4 measures production_path_fps = 13 while the kernel-only loop
reads 104 fps (9.6 ms/frame). Same construction as the bench's production
secondary, but each stage of process_pixels is timed separately on host:
  1. frame_transform_at (host FrameTransform row build)
  2. KernelDynamics/plane cfg assembly
  3. matrix device transfer (device_put of (rows, 14) f32 via the tunnel)
  4. dispatch (the jitted call issue)
  5. end-to-end prod frame with queue depth (the bench's number)

Run on the real chip: python experiments/prod_path_probe.py
"""
from __future__ import annotations

import math
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from gyroflow_tpu.core.manager import StabilizationManager

    rng = np.random.default_rng(0)
    with tempfile.NamedTemporaryFile("w", suffix=".gcsv", delete=False) as fh:
        fh.write("GYROFLOW IMU LOG\ntscale,0.001\ngscale,1.0\n"
                 "ascale,1.0\nt,gx,gy,gz\n")
        for i in range(1200):
            fh.write(f"{i},{0.04 * math.sin(i / 30):.6f},"
                     f"{0.02 * math.cos(i / 45):.6f},0.008\n")
        gcsv = fh.name

    mgr = StabilizationManager()
    mgr.init_from_video_data(1000.0, 60.0, 60, (3840, 2160))
    mgr.load_gyro_data(gcsv)
    mgr.params.frame_readout_time = 8.0
    mgr.recompute_blocking()
    y_host = rng.integers(0, 1024, (2160, 3840, 1)).astype(np.uint16)
    uv_host = rng.integers(0, 1024, (1080, 1920, 2)).astype(np.uint16)
    y_dev = [jax.device_put(y_host), jax.device_put(y_host + 1)]
    uv_dev = [jax.device_put(uv_host), jax.device_put(uv_host + 1)]

    ft0 = mgr.frame_transform_at(0.0)
    for shape in ((2160, 3840, 1), (1080, 1920, 2)):
        cfg_p, _ = mgr._plane_cfg_dyn(ft0, shape, 8,
                                      0 if shape[2] == 1 else 1,
                                      1023.0, True, None, None)
        mgr._win_cache[(cfg_p, shape)] = (40, 256, 128, 96, 16, 32)

    def prod_frame(i):
        ts_us = int(i * 1e6 / 60.0)
        oy, iy = mgr.process_pixels(ts_us, y_dev[i % 2], plane_index=0,
                                    max_pixel_value=1023.0, plane_rects=True,
                                    defer_overflow=True)
        ouv, iuv = mgr.process_pixels(ts_us, uv_dev[i % 2], plane_index=1,
                                      max_pixel_value=1023.0, plane_rects=True,
                                      defer_overflow=True)
        return oy, ouv

    oy, ouv = prod_frame(0)
    jax.block_until_ready(ouv)

    N = 12
    # 1. frame_transform_at
    t0 = time.time()
    for i in range(N):
        ft = mgr.frame_transform_at(i / 60.0)
    t_ft = (time.time() - t0) / N * 1000
    print(f"1. frame_transform_at (Y rows):      {t_ft:7.2f} ms")

    # 1b. UV frame transform (plane_rects halving path) — what process_pixels
    # does for plane_index=1
    t0 = time.time()
    for i in range(N):
        ft = mgr.frame_transform_at(i / 60.0)
    t_ft2 = (time.time() - t0) / N * 1000
    print(f"1b. second frame_transform_at:       {t_ft2:7.2f} ms")

    # 3. matrix upload
    mats = np.asarray(ft.matrices, np.float32) if hasattr(ft, "matrices") else None
    if mats is not None:
        t0 = time.time()
        for i in range(N):
            d = jax.device_put(mats + np.float32(i))
        jax.block_until_ready(d)
        t_up = (time.time() - t0) / N * 1000
        print(f"3. device_put (rows,14) f32:         {t_up:7.2f} ms")

    # 5. full prod frame, issue-only then blocked
    t0 = time.time()
    outs = [prod_frame(i) for i in range(N)]
    t_issue = (time.time() - t0) / N * 1000
    jax.block_until_ready(outs[-1][1])
    t_total = (time.time() - t0) / N * 1000
    print(f"5. prod frame issue-only:            {t_issue:7.2f} ms")
    print(f"5. prod frame incl. drain:           {t_total:7.2f} ms")

    # 6. cProfile the issue path to catch the unexpected
    import cProfile
    import pstats
    pr = cProfile.Profile()
    pr.enable()
    outs = [prod_frame(i) for i in range(N)]
    pr.disable()
    jax.block_until_ready(outs[-1][1])
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(22)
    os.unlink(gcsv)


if __name__ == "__main__":
    main()

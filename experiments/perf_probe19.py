"""Probe 19 (round 4): fresh device-op cost breakdown AFTER band_mode=1.

VERDICT r3 next-step #1: probe 18's mod-8 band build took the bench from
63.6 to 90.5 fps, invalidating the r3 trace (C band 3.63 / R band 1.46 /
rest 3.55 ms of a 14.4 ms step). This probe re-captures a jax.profiler
device trace of the exact bench step (4K 10-bit YUV420, lanczos4, per-row
RS) and prints per-op device totals, so round 4 attacks the REAL current
top cost instead of the stale one.

Run on the real chip: python experiments/perf_probe19.py
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_matrices  # noqa: E402

TRACE_DIR = "/tmp/gf_trace_r4"
FRAMES = 8


def build_step():
    import jax
    import jax.numpy as jnp

    from gyroflow_tpu.ops import remap
    from gyroflow_tpu.ops.kernel_params import (FIX_COLOR_RANGE, KernelConfig,
                                                KernelDynamics)

    rng = np.random.default_rng(0)
    planes = []
    for (W, H, plane_index, kchan) in ((3840, 2160, 0, 1), (1920, 1080, 1, 2)):
        f = (W * 0.62, W * 0.62)
        fov = 0.92
        cfg = KernelConfig(width=W, height=H, output_width=W, output_height=H,
                           interpolation=8, distortion_model="opencv_fisheye",
                           plane_index=plane_index, flags=FIX_COLOR_RANGE)
        dyn = KernelDynamics.make(f=f, c=(W / 2, H / 2),
                                  k=[0.25, -0.07, 0.02, -0.003], fov=fov,
                                  max_pixel_value=1023.0,
                                  pixel_value_limit=1023.0,
                                  background=(0, 0, 0, 1))
        img = jnp.asarray(rng.uniform(0, 1023, (H, W, kchan)).astype(np.float32))
        mats = jnp.asarray(make_matrices(W, H, f, fov, H))
        planes.append((cfg, dyn, img, mats))

    win_y = (40, 256, 128, 96, 32)
    win_uv = (40, 256, 128, 96, 32)
    TILE_H = 16

    @jax.jit
    def run_frame(y, yl, uv, uvm, salt):
        cfg0, dyn0 = planes[0][0], planes[0][1]
        cfg1, dyn1 = planes[1][0], planes[1][1]
        out_y, ov0 = remap.remap_plane_pallas(y + salt, yl, cfg0, dyn0,
                                              win_h=win_y[0], win_w=win_y[1],
                                              win_k=win_y[2], tile_w=win_y[3],
                                              tile_h=TILE_H, win_r=win_y[4])
        out_uv, ov1 = remap.remap_plane_pallas(uv + salt, uvm, cfg1, dyn1,
                                               win_h=win_uv[0], win_w=win_uv[1],
                                               win_k=win_uv[2], tile_w=win_uv[3],
                                               tile_h=TILE_H, win_r=win_uv[4])
        return jnp.sum(out_y) + jnp.sum(out_uv) + salt, ov0 | ov1

    return planes, run_frame


def parse_trace(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not paths:
        raise RuntimeError(f"no trace found under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # identify device (TPU) process ids from metadata
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm.lower() or "xla" in nm.lower():
                dev_pids.add(ev["pid"])
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        totals[name] += ev.get("dur", 0) / 1000.0  # us -> ms
        counts[name] += 1
    return totals, counts, path


def main():
    import jax
    import jax.numpy as jnp

    planes, run_frame = build_step()
    y_img, y_mats = planes[0][2], planes[0][3]
    uv_img, uv_mats = planes[1][2], planes[1][3]

    out, ov = run_frame(y_img, y_mats, uv_img, uv_mats, jnp.float32(0.0))
    assert not bool(ov), "window overflow at bench geometry"
    float(out)

    salts = [jnp.float32(i * 1e-6) for i in range(FRAMES)]
    # timed (untraced) reference
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [run_frame(y_img, y_mats, uv_img, uv_mats, salts[i])
                for i in range(FRAMES)]
        float(outs[-1][0])
        dt = (time.time() - t0) / FRAMES
        best = dt if best is None else min(best, dt)
    print(f"untraced: {best*1000:.2f} ms/frame ({1/best:.1f} fps)")

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        outs = [run_frame(y_img, y_mats, uv_img, uv_mats, salts[i])
                for i in range(FRAMES)]
        float(outs[-1][0])

    totals, counts, path = parse_trace(TRACE_DIR)
    print(f"trace: {path}")
    print(f"{'op':<64} {'ms/frame':>9} {'count':>6}")
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    total = 0.0
    for name, ms in rows[:28]:
        per_frame = ms / FRAMES
        total += ms
        print(f"{name[:64]:<64} {per_frame:9.3f} {counts[name]:6d}")
    print(f"sum of listed device ms/frame: {total / FRAMES:.2f}")


if __name__ == "__main__":
    main()

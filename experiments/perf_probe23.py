"""Probe 23 (round 4): where does the ~1 ms/frame wall-vs-device gap live?

Probe 19 (fresh trace): per-frame program device span = 8.44 ms. Probe 22:
per-frame dispatch wall = 9.4-9.8 ms AND F=8 scan windows also 9.44 — both
~1 ms over the device span. Hypotheses:
  H1 host-issue bound: the 1-core host takes ~9.4 ms of Python/axon-RPC work
     to ISSUE each call, so the queue starves (per-frame path).
  H2 the scanned window program's device span itself grows to ~9.4 (scan
     carry/slicing overhead), masking H1 in the window path.
Measurements:
  1. issue-only loop time for the per-frame path (no blocking until end,
     queue depth >> loop) — if ~9.4 ms/call, H1 confirmed.
  2. jax.profiler trace of the F=8 scan program — device span per frame.

Run: python experiments/perf_probe23.py
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

TRACE_DIR = "/tmp/gf_trace_p23"


def main():
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
        mats = np.asarray(make_matrices(W, H, f, fov, H))
        planes.append((cfg, dyn, img, mats))

    win = (40, 256, 128, 96, 32)
    TILE_H = 16
    (cfg_y, dyn_y, y_img, y_mats0) = planes[0]
    (cfg_uv, dyn_uv, uv_img, uv_mats0) = planes[1]

    def step(y, yl, uv, uvm, salt):
        out_y, _ = remap.remap_plane_pallas(y + salt, yl, cfg_y, dyn_y,
                                            win_h=win[0], win_w=win[1],
                                            win_k=win[2], tile_w=win[3],
                                            tile_h=TILE_H, win_r=win[4])
        out_uv, _ = remap.remap_plane_pallas(uv + salt, uvm, cfg_uv, dyn_uv,
                                             win_h=win[0], win_w=win[1],
                                             win_k=win[2], tile_w=win[3],
                                             tile_h=TILE_H, win_r=win[4])
        return jnp.sum(out_y) + jnp.sum(out_uv) + salt

    run_frame = jax.jit(step)
    yl = jnp.asarray(y_mats0)
    uvm = jnp.asarray(uv_mats0)
    salts = [jnp.float32(i * 1e-6) for i in range(24)]
    float(run_frame(y_img, yl, uv_img, uvm, salts[0]))

    # 1. issue-only timing
    for _ in range(2):
        t0 = time.time()
        outs = [run_frame(y_img, yl, uv_img, uvm, salts[i]) for i in range(24)]
        t_issue = (time.time() - t0) / 24
        jax.block_until_ready(outs[-1])
        t_total = (time.time() - t0) / 24
        print(f"issue-only: {t_issue*1000:6.2f} ms/call   "
              f"wall: {t_total*1000:6.2f} ms/frame")

    # 2. F=8 scan window trace
    F = 8
    yl_f = jnp.asarray(np.stack([y_mats0] * F))
    uvm_f = jnp.asarray(np.stack([uv_mats0] * F))
    ss = jnp.arange(F, dtype=jnp.float32) * 1e-6

    @jax.jit
    def run_window(y, uv, yls, uvms, s):
        def body(acc, xs):
            yl_i, uvm_i, s_i = xs
            return acc + step(y, yl_i, uv, uvm_i, s_i), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (yls, uvms, s))
        return acc

    float(run_window(y_img, uv_img, yl_f, uvm_f, ss))
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for rep in range(3):
            out = run_window(y_img, uv_img, yl_f, uvm_f, ss + rep * 1e-3)
        float(out)

    # parse device trace: per-op totals for the window program
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace captured")
        return
    with gzip.open(sorted(files)[-1], "rt") as fh:
        trace = json.load(fh)
    dev_pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm:
                dev_pids.add(ev["pid"])
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            name = ev.get("name", "")
            totals[name] += ev.get("dur", 0) / 1000.0
            counts[name] += 1
    n_frames = 3 * F
    print(f"\nwindow-program device ops (ms/frame over {n_frames} frames):")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{name[:70]:70s} {ms / n_frames:8.3f}  {counts[name]}")


if __name__ == "__main__":
    main()

"""Renderer-LOOP throughput with the device mocked (VERDICT r3 next-step #5).

host_pipeline_bench.py measured the host STAGES; this bench drives the REAL
`render()` loop (gyroflow_tpu/render/renderer.py) end-to-end in one process
— decode-ahead thread, plane grouping, window/pipeline dispatch, ungroup,
async y4m encode — with `manager.process_pixels` replaced by an identity
stub, and reports ONE fps number: the host loop's ceiling. If this number
is >= the device-step fps (~100), the host pipeline is not the bottleneck
on a multi-core TPU VM.

Environment caveat (see host_pipeline_bench.py): this sandbox's fresh-page
allocation cliff makes long file-backed runs meaningless, so the reader is
an in-memory synthetic source that REUSES two preallocated frames and the
writer is the real Y4MWriter pointed at /dev/null (real marshalling +
write() syscalls, no page accumulation).

Run: PYTHONPATH=/root/repo python experiments/renderer_loop_bench.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

W, H, N, FPS = 3840, 2160, 96, 60.0


class MemReader:
    """Planar in-memory reader: yields (ts_us, [Y, U, V]) uint16 planes."""

    def __init__(self, fmt):
        self.fmt = fmt
        self.width, self.height = W, H
        self.fps = FPS
        self.frame_count = N
        rng = np.random.default_rng(0)
        shapes = fmt.plane_shapes(W, H)
        self.frames = [
            [rng.integers(0, 1024, (h, w, 1), dtype=np.uint16)
             for (h, w, _c) in shapes]
            for _ in range(2)]
        self.i = 0

    def seek_frame(self, idx):
        self.i = idx

    def __iter__(self):
        while self.i < N:
            ts_us = int(self.i / self.fps * 1e6)
            yield ts_us, self.frames[self.i % 2]
            self.i += 1

    def close(self):
        pass


def main():
    from gyroflow_tpu.core.manager import StabilizationManager
    from gyroflow_tpu.render import renderer
    from gyroflow_tpu.render.formats import RAW_FORMATS
    from gyroflow_tpu.render.renderer import RenderOptions, render
    from gyroflow_tpu.render.y4m_io import Y4MWriter

    fmt = RAW_FORMATS["yuv420p10le"]

    # synthetic gyro (gcsv) so the manager computes real FrameTransforms
    gcsv = "/tmp/loopbench.gcsv"
    with open(gcsv, "w") as fh:
        fh.write("GYROFLOW IMU LOG\ntscale,0.001\ngscale,1.0\nascale,1.0\n"
                 "t,gx,gy,gz\n")
        for i in range(int(N / FPS * 1000) + 200):
            fh.write(f"{i},{0.02 * np.sin(i / 40):.5f},"
                     f"{0.01 * np.cos(i / 55):.5f},0.003\n")

    mgr = StabilizationManager()
    mgr.init_from_video_data(N / FPS * 1000.0, FPS, N, (W, H))
    mgr.load_gyro_data(gcsv)
    mgr.recompute_blocking()

    # identity device step: returns the input plane unchanged (native dtype)
    def fake_process_pixels(ts_us, plane, **kw):
        return plane, {"fov": 1.0, "backend": "mock"}

    mgr.process_pixels = fake_process_pixels

    reader = MemReader(fmt)

    def fake_open_reader(path):
        return "planar", reader

    def fake_open_writer(path, ow, oh, fps, options, rdr, kind, input_path,
                         **kw):
        return "planar", Y4MWriter("/dev/null", ow, oh, fps, "yuv420p10le")

    renderer.open_reader = fake_open_reader
    renderer.open_writer = fake_open_writer

    opts = RenderOptions(audio=False, async_encode=True, decode_ahead=4,
                         pipeline_depth=2)
    t0 = time.time()
    stats = render(mgr, "mem://synthetic.y4m", "/dev/null", opts)
    dt = time.time() - t0
    fps = stats["frames"] / dt
    print(f"renderer loop (device mocked, 4K 10-bit YUV420, {stats['frames']} "
          f"frames): {fps:.1f} fps  ({dt / stats['frames'] * 1000:.1f} ms/frame)")
    print(f"stage times: {stats}")


if __name__ == "__main__":
    main()

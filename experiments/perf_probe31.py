"""Probe 31 (round 5): 4K EWA rung timings after the same-row jacobian,
3-in-1 stacked coords call, integer-exact cap check, and bc2 coeff-select.

With the default same-row jacobian the max needed radius on the bench
content is exactly 2.0 on both axes (perf_probe30), so the overflow flags
reported here are HONEST: ov=False means the rung's output is exact and the
ladder would settle on it. Run: python experiments/perf_probe31.py [trace]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_probe29 import build, time_step  # noqa: E402


def main():
    W, H = 3840, 2160
    rungs = ((24, 256, 128, 96, 8, 16, 2, 2),
             (32, 256, 128, 96, 8, 24, 2, 2),
             (40, 256, 128, 96, 8, 32, 4, 4))
    for win in rungs:
        t0 = time.time()
        img, mats, step = build(W, H, win)
        best, ovb = time_step(img, mats, step)
        print(f"4K rung {win}: {best*1000:.2f} ms/frame ({1/best:.1f} fps) "
              f"overflow={ovb} (compile {time.time()-t0-best*18:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()

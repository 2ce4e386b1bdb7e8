"""Chessboard-corner overlay drawing for the calibrator.

Port of /root/reference/src/core/calibration/drawing.rs (itself a port of
OpenCV's drawChessboardCorners): X-marks + circles per corner, rainbow
row-connected lines when the full pattern was found, red marks otherwise.
Draws into the shared DrawCanvas so the marks blend inside the remap
pipeline like every other overlay.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

from ..core.drawing import (COLOR_BLUE, COLOR_BLUE2, COLOR_BLUE3, COLOR_GREEN,
                            COLOR_MAGENTA, COLOR_RED, COLOR_YELLOW2,
                            STAGE_ON_INPUT, DrawCanvas)

# calibration/drawing.rs:8-16 row color cycle
LINE_COLORS = (COLOR_RED, COLOR_BLUE2, COLOR_YELLOW2, COLOR_GREEN,
               COLOR_BLUE3, COLOR_BLUE, COLOR_MAGENTA)


def _line(canvas: DrawCanvas, p1, p2, color: int):
    canvas.put_line(p1[0], p1[1], p2[0], p2[1], color, alpha=0,
                    stage=STAGE_ON_INPUT)


def _circle(canvas: DrawCanvas, center, radius: float, color: int):
    # Bresenham-circle equivalent: dense angular sampling at pixel pitch
    steps = max(int(2.0 * math.pi * max(radius, 1.0)), 8)
    for i in range(steps):
        a = 2.0 * math.pi * i / steps
        canvas.put_pixel(center[0] + radius * math.cos(a),
                         center[1] + radius * math.sin(a),
                         color, 0, STAGE_ON_INPUT)


def draw_chessboard_corners(org_size: Tuple[int, int], size: Tuple[int, int],
                            canvas: DrawCanvas, pattern_size: Tuple[int, int],
                            corners: Sequence[Tuple[float, float]],
                            found: bool, inverted: bool = False):
    """calibration/drawing.rs:7-53."""
    ow, oh = org_size
    w, h = size
    rw = w / max(ow, 1)
    rh = h / max(oh, 1)
    r = 10.0 * rw
    if not found:
        for (cx, cy) in corners:
            pt = (round(cx * rw), round(cy * rh))
            if inverted:
                pt = (pt[0], h - pt[1])
            _line(canvas, (pt[0] - r, pt[1] - r), (pt[0] + r, pt[1] + r), COLOR_RED)
            _line(canvas, (pt[0] - r, pt[1] + r), (pt[0] + r, pt[1] - r), COLOR_RED)
            _circle(canvas, pt, r + 1.0, COLOR_RED)
        return
    prev_pt = (0.0, 0.0)
    i = 0
    for y in range(pattern_size[1]):
        color = LINE_COLORS[y % len(LINE_COLORS)]
        for _x in range(pattern_size[0]):
            if i >= len(corners):
                return
            cx, cy = corners[i]
            pt = (round(cx * rw), round(cy * rh))
            if inverted:
                pt = (pt[0], h - pt[1])
            if i != 0:
                _line(canvas, prev_pt, pt, color)
            _line(canvas, (pt[0] - r, pt[1] - r), (pt[0] + r, pt[1] + r), color)
            _line(canvas, (pt[0] - r, pt[1] + r), (pt[0] + r, pt[1] - r), color)
            _circle(canvas, pt, r + 1.0, color)
            prev_pt = pt
            i += 1

"""Gyro/quaternion pre-filters.

Port of /root/reference/src/core/filtering.rs: 2nd-order Butterworth low-pass
(RBJ biquad, DirectForm2Transposed) run forward+backward over gyro/accel
channels and over raw quaternion components, and a moving-window median filter.
The quat glitch-repair (filtering.rs:163+) is a follow-up milestone (off by
default in the reference: IMUTransforms::glitch_filter = false).
"""
from __future__ import annotations

import bisect
import math
from collections import deque
from typing import List

import numpy as np

from .file_metadata import TimeIMU
from .time_quat import TimeQuat

Q_BUTTERWORTH = 1.0 / math.sqrt(2.0)


class Biquad:
    """RBJ low-pass biquad, DirectForm2Transposed (matches the biquad crate)."""

    def __init__(self, freq: float, sample_rate: float):
        if freq <= 0.0 or freq * 2.0 >= sample_rate:
            raise ValueError("invalid cutoff frequency")
        omega = 2.0 * math.pi * freq / sample_rate
        cos_o = math.cos(omega)
        alpha = math.sin(omega) / (2.0 * Q_BUTTERWORTH)
        a0 = 1.0 + alpha
        self.b0 = ((1.0 - cos_o) / 2.0) / a0
        self.b1 = (1.0 - cos_o) / a0
        self.b2 = self.b0
        self.a1 = (-2.0 * cos_o) / a0
        self.a2 = (1.0 - alpha) / a0
        self.s1 = 0.0
        self.s2 = 0.0

    def run(self, x: float) -> float:
        y = self.b0 * x + self.s1
        self.s1 = self.b1 * x - self.a1 * y + self.s2
        self.s2 = self.b2 * x - self.a2 * y
        return y

    def run_array(self, xs: np.ndarray) -> np.ndarray:
        out = np.empty_like(xs)
        b0, b1, b2, a1, a2 = self.b0, self.b1, self.b2, self.a1, self.a2
        s1, s2 = self.s1, self.s2
        for i in range(len(xs)):
            x = xs[i]
            y = b0 * x + s1
            s1 = b1 * x - a1 * y + s2
            s2 = b2 * x - a2 * y
            out[i] = y
        self.s1, self.s2 = s1, s2
        return out


def lowpass_gyro_forward_backward(freq: float, sample_rate: float,
                                  data: List[TimeIMU]) -> None:
    """filtering.rs:43-71 — in-place, separate filter states per channel/direction."""
    if freq <= 0.0 or freq * 2.0 >= sample_rate:
        return
    for is_rev in (False, True):
        filters = [Biquad(freq, sample_rate) for _ in range(6)]
        order = reversed(data) if is_rev else iter(data)
        for x in order:
            if x.gyro is not None:
                for c in range(3):
                    x.gyro[c] = filters[c].run(float(x.gyro[c]))
            if x.accl is not None:
                for c in range(3):
                    x.accl[c] = filters[3 + c].run(float(x.accl[c]))


def lowpass_quats_forward_backward(freq: float, sample_rate: float,
                                   tq: TimeQuat) -> TimeQuat:
    """filtering.rs:72-94: filter raw (x,y,z,w) coords then renormalize.

    nalgebra coords order is (x, y, z, w); four channels, f64."""
    if freq <= 0.0 or freq * 2.0 >= sample_rate:
        return tq
    coords = np.stack([tq.quats[:, 1], tq.quats[:, 2], tq.quats[:, 3], tq.quats[:, 0]],
                      axis=-1)
    for is_rev in (False, True):
        filters = [Biquad(freq, sample_rate) for _ in range(4)]
        sl = coords[::-1] if is_rev else coords
        for c in range(4):
            sl[:, c] = filters[c].run_array(sl[:, c])
    out = np.stack([coords[:, 3], coords[:, 0], coords[:, 1], coords[:, 2]], axis=-1)
    n = np.linalg.norm(out, axis=-1, keepdims=True)
    n = np.where(n == 0, 1.0, n)
    return TimeQuat(tq.timestamps_us.copy(), out / n)


class MovingMedian:
    """Streaming moving-window median (matches the median crate's Filter)."""

    def __init__(self, size: int):
        self.size = max(size, 1)
        self.window = deque()
        self.sorted: list = []

    def consume(self, x: float) -> float:
        self.window.append(x)
        bisect.insort(self.sorted, x)
        if len(self.window) > self.size:
            old = self.window.popleft()
            del self.sorted[bisect.bisect_left(self.sorted, old)]
        n = len(self.sorted)
        mid = n // 2
        if n % 2 == 1:
            return self.sorted[mid]
        return (self.sorted[mid - 1] + self.sorted[mid]) / 2.0


def median_gyro_forward_backward(size: int, sample_rate: float,
                                 data: List[TimeIMU]) -> None:
    """filtering.rs:131-160."""
    if size <= 0:
        return
    for is_rev in (False, True):
        filters = [MovingMedian(size) for _ in range(6)]
        order = reversed(data) if is_rev else iter(data)
        for x in order:
            if x.gyro is not None:
                for c in range(3):
                    x.gyro[c] = filters[c].consume(float(x.gyro[c]))
            if x.accl is not None:
                for c in range(3):
                    x.accl[c] = filters[3 + c].consume(float(x.accl[c]))

"""Raw-frame pixel formats shared by the media backends (y4m / ffmpeg pipes).

The reference builds one per-plane processor per ffmpeg pixel format
(/root/reference/src/rendering/mod.rs:564-679). This module is the TPU-side
equivalent of that format matrix: for each supported raw format it knows the
plane geometry (count, subsampling, dtype, bit depth) and how to
pack/unpack a raw frame buffer <-> a list of (H, W) numpy plane arrays.

Planes are grouped for the kernel like the reference's PixelType mapping:
YUV420P10LE -> Luma16 + 2x chroma (processed as one UV16 pair when the two
chroma planes share geometry), GBRPF32LE -> 3x R32f, RGB/RGBA interleaved
formats -> one multi-channel plane.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


@dataclass(frozen=True)
class RawFormat:
    """Geometry of one raw pixel format (ffmpeg naming)."""
    name: str                 # ffmpeg pix_fmt name
    dtype: np.dtype
    bit_depth: int            # significant bits (10 for yuv420p10le)
    planes: Tuple[Tuple[int, int, int], ...]  # (x_sub, y_sub, channels) per plane
    is_yuv: bool = True
    y4m_tag: str = ""         # YUV4MPEG2 C-tag ("" = not representable in y4m)

    @property
    def max_value(self) -> float:
        if self.dtype == np.float32:
            return 1.0
        return float((1 << self.bit_depth) - 1)

    def plane_shapes(self, w: int, h: int) -> List[Tuple[int, int, int]]:
        return [(-(-h // ys), -(-w // xs), ch) for (xs, ys, ch) in self.planes]

    def frame_bytes(self, w: int, h: int) -> int:
        return sum(ph * pw * ch * self.dtype.itemsize
                   for (ph, pw, ch) in self.plane_shapes(w, h))

    def unpack(self, buf: bytes, w: int, h: int) -> List[np.ndarray]:
        """Raw frame buffer -> list of (ph, pw, ch) arrays (native dtype)."""
        out = []
        off = 0
        for (ph, pw, ch) in self.plane_shapes(w, h):
            n = ph * pw * ch
            a = np.frombuffer(buf, self.dtype, count=n, offset=off)
            out.append(a.reshape(ph, pw, ch))
            off += n * self.dtype.itemsize
        return out

    def pack(self, planes: List[np.ndarray]) -> bytes:
        parts = []
        for a, (xs, ys, ch) in zip(planes, self.planes):
            parts.append(np.ascontiguousarray(a, self.dtype).tobytes())
        return b"".join(parts)

    def write_to(self, f, planes: List[np.ndarray]):
        """Write planes straight to a file object — no tobytes/join copies
        (measured 2x encode throughput at 4K 10-bit on one core)."""
        for a, (xs, ys, ch) in zip(planes, self.planes):
            f.write(memoryview(np.ascontiguousarray(a, self.dtype)).cast("B"))


def _yuv(name, depth, xsub, ysub, tag):
    dt = np.dtype(np.uint8) if depth <= 8 else np.dtype("<u2")
    return RawFormat(name, dt, depth,
                     ((1, 1, 1), (xsub, ysub, 1), (xsub, ysub, 1)),
                     is_yuv=True, y4m_tag=tag)


RAW_FORMATS = {f.name: f for f in [
    # planar YUV (rendering/mod.rs:583-628 plane matrix)
    _yuv("yuv420p", 8, 2, 2, "420jpeg"),
    _yuv("yuv420p10le", 10, 2, 2, "420p10"),
    _yuv("yuv420p12le", 12, 2, 2, "420p12"),
    _yuv("yuv420p16le", 16, 2, 2, "420p16"),
    _yuv("yuv422p", 8, 2, 1, "422"),
    _yuv("yuv422p10le", 10, 2, 1, "422p10"),
    _yuv("yuv422p16le", 16, 2, 1, "422p16"),
    _yuv("yuv444p", 8, 1, 1, "444"),
    _yuv("yuv444p10le", 10, 1, 1, "444p10"),
    _yuv("yuv444p16le", 16, 1, 1, "444p16"),
    # semi-planar (interleaved chroma): NV12 -> Luma8 + one UV8 pair plane,
    # P010/P016 -> Luma16 + UV16 (rendering/mod.rs:583-600). P010 carries
    # its 10 bits in the high bits of each u16, so it is processed at
    # 16-bit scale exactly like the reference's Luma16/UV16 mapping.
    RawFormat("nv12", np.dtype(np.uint8), 8, ((1, 1, 1), (2, 2, 2))),
    RawFormat("p010le", np.dtype("<u2"), 16, ((1, 1, 1), (2, 2, 2))),
    RawFormat("p016le", np.dtype("<u2"), 16, ((1, 1, 1), (2, 2, 2))),
    # grayscale
    RawFormat("gray", np.dtype(np.uint8), 8, ((1, 1, 1),), True, "mono"),
    RawFormat("gray10le", np.dtype("<u2"), 10, ((1, 1, 1),), True, "mono10"),
    RawFormat("gray16le", np.dtype("<u2"), 16, ((1, 1, 1),), True, "mono16"),
    # interleaved RGB (single multi-channel plane)
    RawFormat("rgb24", np.dtype(np.uint8), 8, ((1, 1, 3),), False),
    RawFormat("rgba", np.dtype(np.uint8), 8, ((1, 1, 4),), False),
    RawFormat("rgb48le", np.dtype("<u2"), 16, ((1, 1, 3),), False),
    RawFormat("rgba64le", np.dtype("<u2"), 16, ((1, 1, 4),), False),
    # planar float RGB (GBR order like ffmpeg) + alpha
    RawFormat("gbrpf32le", np.dtype("<f4"), 32,
              ((1, 1, 1), (1, 1, 1), (1, 1, 1)), False),
    RawFormat("gbrapf32le", np.dtype("<f4"), 32,
              ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)), False),
]}

Y4M_TAGS = {f.y4m_tag: f for f in RAW_FORMATS.values() if f.y4m_tag}
# common y4m aliases
Y4M_TAGS["420"] = RAW_FORMATS["yuv420p"]
Y4M_TAGS["420mpeg2"] = RAW_FORMATS["yuv420p"]
Y4M_TAGS["420paldv"] = RAW_FORMATS["yuv420p"]


def pick_10bit_fmt(subsampling: str = "420") -> RawFormat:
    return RAW_FORMATS[f"yuv{subsampling}p10le"]

"""Minimal OpenEXR 2.0 writer/reader (uncompressed f32 scanlines).

The reference writes ST-maps as EXR (stmap.rs:124-146 via the `exr` crate);
this image's OpenCV lacks OpenEXR support, so this implements the subset we
need: single-part scanline images, float32 channels, no compression.
"""
from __future__ import annotations

import struct
from typing import Dict

import numpy as np

MAGIC = 20000630
VERSION = 2


def _attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\x00" + typ + b"\x00" + struct.pack("<i", len(data)) + data


def write_exr(path: str, channels: Dict[str, np.ndarray]):
    """channels: name -> (H, W) float32 array (e.g. {"R":..., "G":..., "B":...})."""
    names = sorted(channels)  # EXR requires alphabetical channel order
    h, w = next(iter(channels.values())).shape
    for c in channels.values():
        assert c.shape == (h, w)

    chan_data = b""
    for n in names:
        # name, pixel type (2=float), pLinear+reserved, xSampling, ySampling
        chan_data += n.encode() + b"\x00" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0, 1, 1)
    chan_data += b"\x00"

    header = b""
    header += _attr(b"channels", b"chlist", chan_data)
    header += _attr(b"compression", b"compression", b"\x00")  # NO_COMPRESSION
    header += _attr(b"dataWindow", b"box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += _attr(b"displayWindow", b"box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += _attr(b"lineOrder", b"lineOrder", b"\x00")  # INCREASING_Y
    header += _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f", struct.pack("<2f", 0.0, 0.0))
    header += _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"

    preamble = struct.pack("<ii", MAGIC, VERSION) + header
    # offset table: one entry per scanline
    line_bytes = 8 + w * 4 * len(names)  # y + size prefix + data
    table_size = h * 8
    first_chunk = len(preamble) + table_size
    offsets = b"".join(struct.pack("<Q", first_chunk + y * line_bytes) for y in range(h))

    with open(path, "wb") as f:
        f.write(preamble)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, w * 4 * len(names)))
            for n in names:
                f.write(np.ascontiguousarray(channels[n][y], dtype="<f4").tobytes())


def read_exr(path: str) -> Dict[str, np.ndarray]:
    """Reads files written by write_exr (uncompressed f32, increasing Y)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, _version = struct.unpack_from("<ii", data, 0)
    assert magic == MAGIC, "not an EXR file"
    pos = 8
    names = []
    dw = None
    while data[pos] != 0:
        name_end = data.index(b"\x00", pos)
        name = data[pos:name_end].decode()
        pos = name_end + 1
        typ_end = data.index(b"\x00", pos)
        typ = data[pos:typ_end].decode()
        pos = typ_end + 1
        size = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        payload = data[pos:pos + size]
        pos += size
        if name == "channels":
            p = 0
            while payload[p] != 0:
                ne = payload.index(b"\x00", p)
                names.append(payload[p:ne].decode())
                p = ne + 1 + 16
        elif name == "dataWindow":
            dw = struct.unpack("<4i", payload)
        elif name == "compression":
            assert payload[0] == 0, "only uncompressed EXR supported"
    pos += 1
    w = dw[2] - dw[0] + 1
    h = dw[3] - dw[1] + 1
    pos += h * 8  # offset table
    out = {n: np.empty((h, w), np.float32) for n in names}
    for _ in range(h):
        y, size = struct.unpack_from("<ii", data, pos)
        pos += 8
        for n in sorted(names):
            out[n][y] = np.frombuffer(data, "<f4", w, pos)
            pos += w * 4
    return out

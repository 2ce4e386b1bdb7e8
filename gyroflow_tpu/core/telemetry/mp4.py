"""Minimal ISO-BMFF (MP4/MOV) demuxer for metadata tracks.

The reference delegates MP4 demuxing to the external `telemetry-parser`
crate (src/core/Cargo.toml:14); this is a from-scratch reader of just the
structures needed to locate timed-metadata samples (GoPro `gpmd` etc.):
moov → trak → mdia(hdlr, mdhd) → stbl(stsd, stts, stsz, stsc, stco/co64).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


@dataclass
class Track:
    handler_type: bytes = b""
    handler_name: str = ""
    timescale: int = 1000
    duration: int = 0
    sample_format: bytes = b""
    sample_durations: List[Tuple[int, int]] = field(default_factory=list)  # (count, delta)
    sample_sizes: List[int] = field(default_factory=list)
    chunk_offsets: List[int] = field(default_factory=list)
    sample_to_chunk: List[Tuple[int, int]] = field(default_factory=list)   # (first_chunk, per_chunk)

    def samples(self) -> List[Tuple[int, int, float, float]]:
        """Expand tables to per-sample (offset, size, time_s, duration_s)."""
        n = len(self.sample_sizes)
        # decode times from stts
        times, t = [], 0
        for count, delta in self.sample_durations:
            for _ in range(count):
                times.append(t)
                t += delta
            if len(times) >= n:
                break
        while len(times) < n:
            times.append(t)
            t += self.sample_durations[-1][1] if self.sample_durations else 0
        durs = [(times[i + 1] - times[i]) if i + 1 < n else
                (self.sample_durations[-1][1] if self.sample_durations else 0)
                for i in range(n)]
        # sample→chunk expansion
        out = []
        si = 0
        stc = self.sample_to_chunk
        for ci, coff in enumerate(self.chunk_offsets):
            per = 1
            for first, cnt in stc:
                if ci + 1 >= first:
                    per = cnt
            off = coff
            for _ in range(per):
                if si >= n:
                    break
                out.append((off, self.sample_sizes[si],
                            times[si] / self.timescale, durs[si] / self.timescale))
                off += self.sample_sizes[si]
                si += 1
        return out


def _boxes(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", buf, pos)
        hdr = 8
        if size == 1:
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            break
        yield typ, pos + hdr, pos + size
        pos += size


def _parse_track(buf: bytes, start: int, end: int) -> Track:
    tr = Track()

    def walk(s, e):
        for typ, b, eb in _boxes(buf, s, e):
            if typ in _CONTAINERS:
                walk(b, eb)
            elif typ == b"hdlr":
                tr.handler_type = buf[b + 8:b + 12]
                name = buf[b + 24:eb]
                tr.handler_name = name.split(b"\x00")[0].decode("latin-1", "replace")
            elif typ == b"mdhd":
                ver = buf[b]
                if ver == 1:
                    tr.timescale, tr.duration = struct.unpack_from(">IQ", buf, b + 20)
                else:
                    tr.timescale, tr.duration = struct.unpack_from(">II", buf, b + 12)
            elif typ == b"stsd":
                cnt = struct.unpack_from(">I", buf, b + 4)[0]
                if cnt > 0:
                    tr.sample_format = buf[b + 12:b + 16]
            elif typ == b"stts":
                cnt = struct.unpack_from(">I", buf, b + 4)[0]
                for i in range(cnt):
                    c, d = struct.unpack_from(">II", buf, b + 8 + 8 * i)
                    tr.sample_durations.append((c, d))
            elif typ == b"stsz":
                const, cnt = struct.unpack_from(">II", buf, b + 4)
                if const:
                    tr.sample_sizes = [const] * cnt
                else:
                    tr.sample_sizes = list(struct.unpack_from(f">{cnt}I", buf, b + 12))
            elif typ == b"stsc":
                cnt = struct.unpack_from(">I", buf, b + 4)[0]
                for i in range(cnt):
                    first, per, _ = struct.unpack_from(">III", buf, b + 8 + 12 * i)
                    tr.sample_to_chunk.append((first, per))
            elif typ == b"stco":
                cnt = struct.unpack_from(">I", buf, b + 4)[0]
                tr.chunk_offsets = list(struct.unpack_from(f">{cnt}I", buf, b + 8))
            elif typ == b"co64":
                cnt = struct.unpack_from(">I", buf, b + 4)[0]
                tr.chunk_offsets = list(struct.unpack_from(f">{cnt}Q", buf, b + 8))

    walk(start, end)
    return tr


def parse_tracks(buf: bytes) -> List[Track]:
    tracks = []
    for typ, b, e in _boxes(buf, 0, len(buf)):
        if typ == b"moov":
            for t2, b2, e2 in _boxes(buf, b, e):
                if t2 == b"trak":
                    tracks.append(_parse_track(buf, b2, e2))
    return tracks


def find_metadata_track(buf: bytes, sample_format: bytes) -> Optional[Track]:
    for tr in parse_tracks(buf):
        if tr.sample_format == sample_format:
            return tr
    return None

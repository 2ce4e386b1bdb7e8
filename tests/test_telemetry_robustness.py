"""Telemetry parser robustness: corrupt, truncated and mislabeled inputs
raise TelemetryError (or parse to empty) instead of crashing.

SURVEY §5 failure-detection: the reference's telemetry-parser treats decode
as best-effort — a damaged file must surface as a clean load error, never a
traceback from struct/index internals.
"""
import os

import numpy as np
import pytest

from gyroflow_tpu.core.telemetry import TelemetryError, parse_telemetry_file

EXTS = [".gcsv", ".bbl", ".mp4", ".mov", ".braw", ".r3d", ".insv", ".csv"]


def _expect_clean(path):
    """Parsing must either raise TelemetryError or return metadata."""
    try:
        fm = parse_telemetry_file(path)
    except TelemetryError:
        return None
    return fm


class TestGarbage:
    @pytest.mark.parametrize("ext", EXTS)
    def test_random_bytes(self, tmp_path, ext):
        rng = np.random.default_rng(hash(ext) & 0xFFFF)
        p = str(tmp_path / ("junk" + ext))
        with open(p, "wb") as fh:
            fh.write(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())
        _expect_clean(p)

    @pytest.mark.parametrize("ext", EXTS)
    def test_empty_file(self, tmp_path, ext):
        p = str(tmp_path / ("empty" + ext))
        open(p, "wb").close()
        _expect_clean(p)

    @pytest.mark.parametrize("ext", [".mp4", ".insv", ".braw", ".r3d"])
    def test_header_only(self, tmp_path, ext):
        """Plausible magic bytes followed by nothing."""
        magics = {".mp4": b"\x00\x00\x00\x18ftypmp42",
                  ".insv": b"\x00\x00\x00\x18ftypmp42",
                  ".braw": b"\x00\x00\x00\x18ftypbraw",
                  ".r3d": b"\x00\x00\x04\x00RED2"}
        p = str(tmp_path / ("hdr" + ext))
        with open(p, "wb") as fh:
            fh.write(magics[ext])
        _expect_clean(p)


class TestTruncation:
    def test_truncated_gcsv_rows(self, tmp_path):
        p = tmp_path / "trunc.gcsv"
        p.write_text("GYROFLOW IMU LOG\nversion,1.3\ntscale,0.001\n"
                     "gscale,1.0\nascale,1.0\nt,gx,gy,gz\n"
                     "0,1,2,3\n1,4,5\n2,6")   # ragged rows
        fm = _expect_clean(str(p))
        if fm is not None:
            assert len(fm.raw_imu) >= 1

    def test_truncated_mp4_mid_box(self, tmp_path):
        """Box header whose declared size exceeds the file."""
        p = tmp_path / "cut.mp4"
        p.write_bytes(b"\x00\x00\x00\x18ftypmp42\x00\x00\x00\x00mp42"
                      b"\x7f\xff\xff\xffmoov" + b"\x00" * 64)
        _expect_clean(str(p))

    def test_project_file_not_telemetry(self, tmp_path):
        """.gyroflow handed to the telemetry parser fails cleanly."""
        p = tmp_path / "x.gcsv"
        p.write_text('{"title": "Gyroflow data file"}')
        _expect_clean(str(p))


class TestMutationFuzzKlvCtmd:
    """Byte-mutation fuzz of the Sony KLV and Canon CTMD demuxers: a damaged
    clip must raise TelemetryError (or parse) — struct/index internals must
    never escape (SURVEY §5 failure detection)."""

    def _sony_blob(self):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_sony_canon import make_tagmap
        from gyroflow_tpu.core.telemetry import sony
        return sony.build_tagmap_mp4([make_tagmap(i) for i in range(4)], 30.0,
                                     encoding="klv")

    def _ctmd_blob(self):
        from gyroflow_tpu.core.telemetry.canon_ctmd import (build_ctmd_mp4,
                                                            build_ctmd_sample)
        samples = [build_ctmd_sample(
            {"lens": {"focal_length": 24.0}},
            imu_samples=[[i * 4.0 + j, 0.1, 0.2, 0.3, 0.0, 0.0, 1.0]
                         for j in range(4)],
            sample_rate=1000.0, camera_model="EOS R5",
            imu_orientation="xyz") for i in range(4)]
        return build_ctmd_mp4(samples, 30.0)

    @pytest.mark.parametrize("maker,ext", [("_sony_blob", ".mp4"),
                                           ("_ctmd_blob", ".mp4")])
    def test_mutations(self, tmp_path, maker, ext):
        blob = bytearray(getattr(self, maker)())
        rng = np.random.default_rng(42)
        p = str(tmp_path / ("fuzz" + ext))
        for trial in range(40):
            mutated = bytearray(blob)
            for _ in range(rng.integers(1, 6)):
                mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
            with open(p, "wb") as fh:
                fh.write(mutated)
            _expect_clean(p)

    @pytest.mark.parametrize("maker", ["_sony_blob", "_ctmd_blob"])
    def test_truncations(self, tmp_path, maker):
        blob = getattr(self, maker)()
        p = str(tmp_path / "trunc.mp4")
        for cut in (1, len(blob) // 4, len(blob) // 2, len(blob) - 3):
            with open(p, "wb") as fh:
                fh.write(blob[:cut])
            _expect_clean(p)


class TestMutationFuzzAllParsers:
    """VERDICT r4 (SURVEY §4 robustness): the same byte-mutation/truncation
    harness extended to GPMF, the .insv trailer, Betaflight .bbl, the R3D
    block walk, BRAW mebx, and the DJI djmd track — every parser that will
    see wild bytes. Contract: TelemetryError or a parse, never an internal
    traceback."""

    def _gpmf_blob(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_gpmf import build_mp4, gpmf_payload
        payloads = [gpmf_payload(gyro_raw=[(0, 0, 17)] * 20, scal=1000)
                    for _ in range(4)]
        return build_mp4(payloads), ".mp4"

    def _insv_blob(self, tmp_path):
        from test_insta360 import make_gyro, write_insv
        p = tmp_path / "seed.insv"
        write_insv(str(p), make_gyro(100), exposures=[(0.01, 0.004)],
                   info=b"Insta360 GO 3 v1.0\x00")
        return p.read_bytes(), ".insv"

    def _bbl_blob(self, tmp_path):
        from test_blackbox_bin import build_log
        blob, _rows, _scale = build_log(n=120)
        return blob, ".bbl"

    def _braw_blob(self, tmp_path):
        from test_braw_red import make_braw
        return open(make_braw(tmp_path), "rb").read(), ".braw"

    def _r3d_blob(self, tmp_path):
        from test_braw_red import make_r3d
        return open(make_r3d(tmp_path), "rb").read(), ".r3d"

    def _djmd_blob(self, tmp_path):
        from test_dji_autoload import make_dji_mp4
        return open(make_dji_mp4(tmp_path), "rb").read(), ".mp4"

    MAKERS = ["_gpmf_blob", "_insv_blob", "_bbl_blob", "_braw_blob",
              "_r3d_blob", "_djmd_blob"]

    @pytest.mark.parametrize("maker", MAKERS)
    def test_mutations(self, tmp_path, maker):
        blob, ext = getattr(self, maker)(tmp_path)
        rng = np.random.default_rng(hash(maker) & 0xFFFF)
        p = str(tmp_path / ("fuzz" + ext))
        for _trial in range(40):
            mutated = bytearray(blob)
            for _ in range(int(rng.integers(1, 6))):
                mutated[int(rng.integers(0, len(mutated)))] = \
                    int(rng.integers(0, 256))
            with open(p, "wb") as fh:
                fh.write(mutated)
            fm = _expect_clean(p)
            if fm is not None:
                for r in fm.raw_imu[:32]:
                    assert np.isfinite(r.timestamp_ms)

    @pytest.mark.parametrize("maker", MAKERS)
    def test_truncations(self, tmp_path, maker):
        blob, ext = getattr(self, maker)(tmp_path)
        p = str(tmp_path / ("trunc" + ext))
        for cut in (1, len(blob) // 4, len(blob) // 2, len(blob) - 3):
            with open(p, "wb") as fh:
                fh.write(blob[:cut])
            _expect_clean(p)


class TestMutationFuzzDng:
    """The CinemaDNG / lossless-JPEG reader sees raw camera files — mutate
    and truncate a Compression=7 DNG; the reader must raise a clean
    IOError/ValueError (or read), never struct/index internals and never a
    native crash (utils/ljpeg.py + native ljpeg_decode)."""

    def _dng_blob(self):
        import struct

        from gyroflow_tpu.utils import ljpeg
        rng = np.random.default_rng(1)
        h, w = 16, 24
        cfa = rng.integers(0, 4096, (h, w)).astype(np.uint16)
        jpg = ljpeg.encode(cfa.reshape(h, w // 2, 2), precision=12)
        entries = [(254, 4, [0]), (256, 4, [w]), (257, 4, [h]), (258, 3, [12]),
                   (259, 3, [7]), (262, 3, [32803]), (277, 3, [1]),
                   (278, 4, [h]), (33422, 1, [0, 1, 1, 2]), (50714, 3, [0]),
                   (50717, 4, [4095])]
        n = len(entries) + 2
        data_off = 8 + 2 + n * 12 + 4
        entries += [(273, 4, [data_off]), (279, 4, [len(jpg)])]
        entries.sort(key=lambda x: x[0])
        out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
        out += struct.pack("<H", len(entries))
        tfm = {1: "B", 3: "H", 4: "I"}
        for (tag, typ, vals) in entries:
            packed = struct.pack("<" + tfm[typ] * len(vals),
                                 *vals).ljust(4, b"\x00")
            out += struct.pack("<HHI", tag, typ, len(vals)) + packed
        out += struct.pack("<I", 0)
        out += jpg
        return bytes(out)

    def _read(self, tmp_path, blob):
        from gyroflow_tpu.render.dng_seq import DNGSequenceReader
        p = tmp_path / "f_0000.dng"
        p.write_bytes(blob)
        try:
            r = DNGSequenceReader(str(tmp_path / "f_%04d.dng"))
            for _ts, planes in r:
                for pl in planes:
                    assert np.isfinite(np.asarray(pl, np.float32)).all()
                break
        except (IOError, ValueError):
            pass

    def test_mutations(self, tmp_path):
        blob = self._dng_blob()
        rng = np.random.default_rng(7)
        for _trial in range(40):
            mutated = bytearray(blob)
            for _ in range(int(rng.integers(1, 6))):
                mutated[int(rng.integers(0, len(mutated)))] = \
                    int(rng.integers(0, 256))
            self._read(tmp_path, bytes(mutated))

    def test_truncations(self, tmp_path):
        blob = self._dng_blob()
        for cut in (1, len(blob) // 4, len(blob) // 2, len(blob) - 3):
            self._read(tmp_path, blob[:cut])

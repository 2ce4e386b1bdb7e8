"""GPMF / MP4 telemetry parser tests.

Builds real ISO-BMFF + GPMF KLV byte streams from scratch (independent writer,
not the parser's own code paths) and checks the parser recovers the exact
values, scaling, orientation remap and timing.
"""
import math
import struct

import numpy as np
import pytest

from gyroflow_tpu.core.telemetry import parse_telemetry_file
from gyroflow_tpu.core.telemetry.gpmf import (has_gpmf, parse_gpmf_payloads,
                                              parse_klv)
from gyroflow_tpu.core.telemetry.mp4 import parse_tracks


# ---------------------------------------------------------------------------
# independent writers
# ---------------------------------------------------------------------------

def klv(key: bytes, typ: bytes, ssize: int, repeat: int, payload: bytes) -> bytes:
    assert len(payload) == ssize * repeat
    pad = (-len(payload)) % 4
    return key + typ + bytes([ssize]) + struct.pack(">H", repeat) + payload + b"\x00" * pad


def klv_nested(key: bytes, children: bytes) -> bytes:
    assert len(children) % 4 == 0
    return key + b"\x00\x01" + struct.pack(">H", len(children)) + children


def gpmf_payload(gyro_raw=None, scal=None, orin=None, accl=None, cori=None,
                 grav=None, model="HERO11 Black"):
    streams = b""
    if gyro_raw is not None:
        s = klv(b"STNM", b"c", len(b"Gyroscope"), 1, b"Gyroscope")
        if scal is not None:
            s += klv(b"SCAL", b"l", 4, 1, struct.pack(">i", scal))
        if orin is not None:
            s += klv(b"ORIN", b"c", len(orin), 1, orin.encode())
        s += klv(b"GYRO", b"s", 6, len(gyro_raw),
                 b"".join(struct.pack(">3h", *g) for g in gyro_raw))
        streams += klv_nested(b"STRM", s)
    if accl is not None:
        s = klv(b"SCAL", b"l", 4, 1, struct.pack(">i", 1))
        s += klv(b"ACCL", b"f", 12, len(accl),
                 b"".join(struct.pack(">3f", *a) for a in accl))
        streams += klv_nested(b"STRM", s)
    if cori is not None:
        s = klv(b"SCAL", b"l", 4, 1, struct.pack(">i", 32767))
        s += klv(b"CORI", b"s", 8, len(cori),
                 b"".join(struct.pack(">4h", *q) for q in cori))
        streams += klv_nested(b"STRM", s)
    if grav is not None:
        s = klv(b"SCAL", b"s", 2, 1, struct.pack(">h", 32767))
        s += klv(b"GRAV", b"s", 6, len(grav),
                 b"".join(struct.pack(">3h", *g) for g in grav))
        streams += klv_nested(b"STRM", s)
    dev = klv(b"DVID", b"L", 4, 1, struct.pack(">I", 1))
    dev += klv(b"DVNM", b"c", len(model), 1, model.encode())
    return klv_nested(b"DEVC", dev + streams)


def box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), typ) + payload


def build_mp4(payloads, timescale=1000, payload_dur=1001):
    """MP4 with one gpmd track; payloads land in mdat, one chunk per sample."""
    mdat_payload = b"".join(payloads)
    sizes = [len(p) for p in payloads]

    def full(typ, body, ver=0, flags=0):
        return box(typ, struct.pack(">I", (ver << 24) | flags) + body)

    # stbl
    stsd = full(b"stsd", struct.pack(">I", 1) +
                box(b"gpmd", b"\x00" * 6 + struct.pack(">H", 1)))
    stts = full(b"stts", struct.pack(">III", 1, len(payloads), payload_dur))
    stsz = full(b"stsz", struct.pack(">II", 0, len(sizes)) +
                struct.pack(f">{len(sizes)}I", *sizes))
    stsc = full(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 1, 1))
    # chunk offsets filled after we know the header length; two passes
    for _ in range(2):
        stco_body = struct.pack(">I", len(sizes)) + b"\x00" * 4 * len(sizes)
        stco = full(b"stco", stco_body)
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        hdlr = full(b"hdlr", b"\x00" * 4 + b"meta" + b"\x00" * 12 +
                    b"GoPro MET\x00")
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale,
                                         payload_dur * len(payloads)) +
                    struct.pack(">HH", 0x55C4, 0))
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", mdia)
        moov = box(b"moov", trak)
        ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        header_len = len(ftyp) + len(moov) + 8  # + mdat header
        offs, off = [], header_len
        for s in sizes:
            offs.append(off)
            off += s
        stco_body = struct.pack(">I", len(sizes)) + struct.pack(f">{len(sizes)}I", *offs)
        stco = full(b"stco", stco_body)
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", mdia)
        moov = box(b"moov", trak)
    return ftyp + moov + box(b"mdat", mdat_payload)


# ---------------------------------------------------------------------------


class TestKLV:
    def test_roundtrip_scalars(self):
        blob = klv(b"GYRO", b"s", 6, 2, struct.pack(">6h", 1, -2, 3, 4, 5, -6))
        nodes = parse_klv(blob)
        assert len(nodes) == 1
        v = nodes[0].values()
        assert v.shape == (2, 3)
        assert v.tolist() == [[1, -2, 3], [4, 5, -6]]

    def test_nested_and_alignment(self):
        inner = klv(b"STNM", b"c", 3, 1, b"abc")  # 3 bytes → padded to 4
        blob = klv_nested(b"DEVC", inner)
        nodes = parse_klv(blob)
        assert nodes[0].key == b"DEVC"
        assert nodes[0].children[0].string() == "abc"

    def test_q15_16(self):
        blob = klv(b"TEST", b"q", 4, 1, struct.pack(">i", 3 << 16 | 32768))
        v = parse_klv(blob)[0].values()
        assert abs(v[0, 0] - 3.5) < 1e-9


class TestGPMFStreams:
    def test_gyro_scaling_and_units(self):
        # raw int16s, SCAL=500, ORIN absent → values = raw/500 rad/s → deg/s
        raw = [(500, -1000, 250)]
        fm = parse_gpmf_payloads([(gpmf_payload(gyro_raw=raw, scal=500), 0.0, 1.0)])
        assert len(fm.raw_imu) == 1
        np.testing.assert_allclose(fm.raw_imu[0].gyro,
                                   np.degrees([1.0, -2.0, 0.5]), rtol=1e-6)
        assert fm.detected_source.startswith("GoPro")

    def test_orientation_remap(self):
        # ORIN "zxY": stored triple is (-z, -x, +y)
        raw = [(10, 20, 30)]
        fm = parse_gpmf_payloads([(gpmf_payload(gyro_raw=raw, scal=1, orin="zxY"),
                                   0.0, 1.0)])
        g = np.radians(fm.raw_imu[0].gyro)  # undo deg conversion
        np.testing.assert_allclose(g, [-20.0, 30.0, -10.0], rtol=1e-6)

    def test_sample_timing_even_distribution(self):
        raw = [(i, 0, 0) for i in range(4)]
        fm = parse_gpmf_payloads([(gpmf_payload(gyro_raw=raw, scal=1), 2.0, 1.0)])
        ts = [r.timestamp_ms for r in fm.raw_imu]
        np.testing.assert_allclose(ts, [2000.0, 2250.0, 2500.0, 2750.0])

    def test_cori_quaternions_normalized(self):
        cori = [(32767, 0, 0, 0), (23170, 23170, 0, 0)]  # identity, 90° about x
        fm = parse_gpmf_payloads([(gpmf_payload(cori=cori), 0.0, 1.0)])
        assert len(fm.quaternions) == 2
        np.testing.assert_allclose(np.linalg.norm(fm.quaternions.quats, axis=-1), 1.0)
        np.testing.assert_allclose(fm.quaternions.quats[0], [1, 0, 0, 0], atol=1e-4)

    def test_gravity(self):
        fm = parse_gpmf_payloads([(gpmf_payload(grav=[(0, 0, -32767)]), 0.0, 1.0)])
        np.testing.assert_allclose(fm.gravity_vectors["vec"][0], [0, 0, -1], atol=1e-4)


class TestMP4:
    def test_track_tables_and_extraction(self, tmp_path):
        p1 = gpmf_payload(gyro_raw=[(100, 200, 300)], scal=100)
        p2 = gpmf_payload(gyro_raw=[(400, 500, 600)], scal=100)
        data = build_mp4([p1, p2], timescale=1000, payload_dur=1001)
        tracks = parse_tracks(data)
        assert len(tracks) == 1
        assert tracks[0].sample_format == b"gpmd"
        samples = tracks[0].samples()
        assert len(samples) == 2
        # extracted bytes are the payloads
        off, size, t, dur = samples[0]
        assert data[off:off + size] == p1
        assert t == 0.0 and abs(dur - 1.001) < 1e-9

        f = tmp_path / "clip.mp4"
        f.write_bytes(data)
        assert has_gpmf(str(f))
        fm = parse_telemetry_file(str(f))
        assert len(fm.raw_imu) == 2
        np.testing.assert_allclose(np.radians(fm.raw_imu[1].gyro), [4.0, 5.0, 6.0],
                                   rtol=1e-6)
        # second payload starts at sample time 1.001s
        assert abs(fm.raw_imu[1].timestamp_ms - 1001.0) < 1e-6

    def test_no_gpmd_track(self, tmp_path):
        f = tmp_path / "plain.mp4"
        f.write_bytes(box(b"ftyp", b"isom") + box(b"mdat", b"\x00" * 16))
        assert not has_gpmf(str(f))
        from gyroflow_tpu.core.telemetry import TelemetryError
        with pytest.raises(TelemetryError):
            parse_telemetry_file(str(f))


class TestEndToEnd:
    def test_manager_loads_gpmf_and_integrates(self, tmp_path):
        # 2s of gyro at 200 Hz describing a constant 10 deg/s yaw
        rate, dur_s = 200, 2.0
        n_payloads = int(dur_s)
        per = int(rate)
        payloads = []
        w = math.radians(10.0)  # rad/s about z
        for i in range(n_payloads):
            raw = [(0, 0, int(w * 1000))] * per
            payloads.append(gpmf_payload(gyro_raw=raw, scal=1000))
        data = build_mp4(payloads, timescale=1000, payload_dur=1000)
        f = tmp_path / "gopro.mp4"
        f.write_bytes(data)

        from gyroflow_tpu.core.manager import StabilizationManager
        mgr = StabilizationManager()
        mgr.init_from_video_data(dur_s * 1000.0, 30.0, int(30 * dur_s), (1920, 1080))
        mgr.load_gyro_data(str(f))
        assert mgr.gyro.file_metadata.detected_source.startswith("GoPro")
        assert len(mgr.gyro.quaternions) > 0
        # 10°/s for 2s → ~20° rotation relative to the first sample (the
        # integrators start from a 90°-about-x camera attitude, mod.rs:156)
        from gyroflow_tpu.core import quaternion as quat
        q0, q_end = mgr.gyro.quaternions.quats[0], mgr.gyro.quaternions.quats[-1]
        ang = math.degrees(quat.angle_of(quat.multiply(quat.inverse(q0), q_end)))
        assert 15.0 < ang < 25.0, ang


class TestCAMM:
    @staticmethod
    def _camm_mp4(packets, sample_dur=10, timescale=1000):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_mp4mux import make_media_mp4
        return make_media_mp4(b"meta", b"CameraMetadataMotionHandler", b"camm",
                              packets, timescale=timescale, sample_dur=sample_dur)

    def test_gyro_accel_and_orientation(self, tmp_path):
        pk = []
        # gyro 0.5 rad/s about z; accel gravity; angle_axis 90deg about x
        pk.append(struct.pack("<HH3f", 0, 2, 0.0, 0.0, 0.5))
        pk.append(struct.pack("<HH3f", 0, 3, 0.0, 9.81, 0.0))
        pk.append(struct.pack("<HH3f", 0, 0, math.pi / 2, 0.0, 0.0))
        f = tmp_path / "cam.mp4"
        f.write_bytes(self._camm_mp4(pk))
        fm = parse_telemetry_file(str(f))
        assert fm.detected_source == "CAMM"
        assert len(fm.raw_imu) == 2
        np.testing.assert_allclose(np.radians(fm.raw_imu[0].gyro), [0, 0, 0.5],
                                   rtol=1e-6)
        np.testing.assert_allclose(fm.raw_imu[1].accl, [0, 9.81, 0], rtol=1e-6)
        assert len(fm.quaternions) == 1
        # 90° about x: w = cos(45°), x = sin(45°)
        np.testing.assert_allclose(fm.quaternions.quats[0],
                                   [math.cos(math.pi/4), math.sin(math.pi/4), 0, 0],
                                   atol=1e-6)
        # timing from MP4 sample table: 10ms apart
        assert abs(fm.raw_imu[1].timestamp_ms - 10.0) < 1e-9

    def test_sample_rate_timing(self, tmp_path):
        pk = [struct.pack("<HH3f", 0, 2, 0.0, 0.0, float(i)) for i in range(50)]
        f = tmp_path / "cam.mp4"
        f.write_bytes(self._camm_mp4(pk, sample_dur=5))  # 200 Hz
        fm = parse_telemetry_file(str(f))
        ts = [r.timestamp_ms for r in fm.raw_imu]
        np.testing.assert_allclose(np.diff(ts), 5.0)

    def test_malformed_packets_skipped(self, tmp_path):
        pk = [b"\x00\x00\x02\x00" + b"\x01",        # truncated gyro
              struct.pack("<HH3f", 0, 2, 1.0, 0, 0)]
        f = tmp_path / "cam.mp4"
        f.write_bytes(self._camm_mp4(pk))
        fm = parse_telemetry_file(str(f))
        assert len(fm.raw_imu) == 1

"""Binary blackbox decoder tests with an independent spec-based encoder."""
import struct

import numpy as np
import pytest

from gyroflow_tpu.core.telemetry import parse_telemetry_file
from gyroflow_tpu.core.telemetry.blackbox_bin import (_Stream, _decode_frame,
                                                      parse_blackbox_bin)


def uvb(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def svb(v):
    return uvb((v << 1) ^ (v >> 63) if v < 0 else (v << 1))


def zigzag(v):
    return uvb(((v << 1) ^ (v >> 31)) & 0xFFFFFFFFF) if v < 0 else uvb(v << 1)


def enc_svb(v):
    # standard zigzag
    return uvb((v >> 31) & 1 | (v << 1) if False else ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)) \
        if v < 0 else uvb(v << 1)


def zz(v):
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    return uvb(u & ((1 << 64) - 1))


class TestPrimitives:
    def test_uvb_svb_roundtrip(self):
        data = uvb(0) + uvb(127) + uvb(128) + uvb(100000) + zz(-5) + zz(5) + zz(-1000)
        s = _Stream(data, 0)
        assert s.uvb() == 0 and s.uvb() == 127 and s.uvb() == 128 and s.uvb() == 100000
        assert s.svb() == -5 and s.svb() == 5 and s.svb() == -1000

    def test_tag8_8svb_group(self):
        # 4 fields with enc 6: tag byte marks non-zero fields
        vals = [3, 0, -7, 0]
        tag = 0b0101  # fields 0 and 2 present
        data = bytes([tag]) + zz(3) + zz(-7)
        out = _decode_frame(_Stream(data, 0), [6, 6, 6, 6])
        assert out == vals

    def test_tag2_3s32_bytes_mode(self):
        # tag 3: per-field byte counts 1,1,2
        lead = (3 << 6) | (0 << 0) | (0 << 2) | (1 << 4)
        data = bytes([lead, 0x05, 0xFB]) + struct.pack("<h", -300)
        out = _decode_frame(_Stream(data, 0), [7, 7, 7])
        assert out == [5, -5, -300]

    def test_neg14(self):
        data = uvb(100)
        out = _decode_frame(_Stream(data, 0), [3])
        assert out == [-100]


def build_log(n=200, rate_hz=1000, gyro_scale=0.00106526, with_p=True):
    """Independent encoder: I-frames every 32 samples, P-frames between."""
    names = ["loopIteration", "time", "gyroADC[0]", "gyroADC[1]", "gyroADC[2]",
             "accSmooth[0]", "accSmooth[1]", "accSmooth[2]"]
    pred_i = [0, 0, 0, 0, 0, 0, 0, 0]
    enc_i = [1, 1, 0, 0, 0, 0, 0, 0]
    pred_p = [6, 2, 1, 1, 1, 1, 1, 1]      # increment, straight-line, previous
    enc_p = [9, 0, 0, 0, 0, 0, 0, 0]       # loopIteration NULL in P frames
    hdr = "\n".join([
        "H Product:Blackbox flight data recorder by Nicholas Sherlock",
        "H Data version:2",
        "H Field I name:" + ",".join(names),
        "H Field I signed:0,0,1,1,1,1,1,1",
        "H Field I predictor:" + ",".join(map(str, pred_i)),
        "H Field I encoding:" + ",".join(map(str, enc_i)),
        "H Field P predictor:" + ",".join(map(str, pred_p)),
        "H Field P encoding:" + ",".join(map(str, enc_p)),
        f"H gyro_scale:{gyro_scale}",
        "H acc_1G:2048",
        "H Firmware revision:Betaflight 4.4.0",
    ]) + "\n"
    rng = np.random.default_rng(0)
    gyr = (rng.normal(0, 50, (n, 3))).astype(int)
    acc = (rng.normal(0, 100, (n, 3)) + [0, 0, 2048]).astype(int)
    dt_us = int(1e6 / rate_hz)
    body = b""
    rows = []
    prev = prev2 = None
    for i in range(n):
        t = 1000 + i * dt_us
        row = [i, t, *gyr[i], *acc[i]]
        rows.append(row)
        if i % 32 == 0 or not with_p or prev is None:
            body += b"I"
            body += uvb(row[0]) + uvb(row[1])
            for v in row[2:]:
                body += zz(int(v))
            prev2 = prev = row
        else:
            body += b"P"
            # encodings: loopIteration NULL; others signed VB of residual
            preds = [None,
                     2 * prev[1] - prev2[1] if prev2 is not None else prev[1],
                     *prev[2:]]
            body += b""  # NULL writes nothing
            body += zz(int(row[1] - preds[1]))
            for j in range(2, 8):
                body += zz(int(row[j] - preds[j]))
            prev2, prev = prev, row
    return hdr.encode() + body, rows, gyro_scale


class TestDecode:
    def test_roundtrip(self, tmp_path):
        data, rows, gscale = build_log()
        f = tmp_path / "flight.bbl"
        f.write_bytes(data)
        fm = parse_blackbox_bin(str(f))
        assert fm.detected_source.startswith("Betaflight")
        assert len(fm.raw_imu) == len(rows)
        # timestamps relative ms at 1 kHz
        assert fm.raw_imu[1].timestamp_ms - fm.raw_imu[0].timestamp_ms == pytest.approx(1.0)
        # gyro: raw * scale rad/s -> deg/s
        import math
        want = rows[5][2] * gscale * 180.0 / math.pi
        assert fm.raw_imu[5].gyro[0] == pytest.approx(want, rel=1e-6)
        # accel m/s^2
        assert fm.raw_imu[0].accl[2] == pytest.approx(rows[0][7] / 2048 * 9.80665, rel=1e-6)

    def test_dispatch_from_extension(self, tmp_path):
        data, rows, _ = build_log(n=64)
        f = tmp_path / "x.bfl"
        f.write_bytes(data)
        fm = parse_telemetry_file(str(f))
        assert len(fm.raw_imu) == 64

    def test_csv_fallback_still_works(self, tmp_path):
        f = tmp_path / "log.bbl"
        f.write_text('loopIteration,time (us),gyroADC[0],gyroADC[1],gyroADC[2]\n'
                     '0,1000,1.0,2.0,3.0\n1,2000,1.5,2.5,3.5\n')
        fm = parse_telemetry_file(str(f))
        assert len(fm.raw_imu) == 2

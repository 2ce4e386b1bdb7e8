"""OpenEXR zip pre-pass conformance: the byte reorder and delta predictor
must run in ImfZip.cpp's order (split THEN delta on compress), or files are
unreadable by every other EXR implementation."""
import numpy as np

from gyroflow_tpu.utils.exr import (_predictor_decode, _predictor_encode,
                                    read_exr, write_exr)


def imfzip_compress_scalar(raw: bytes) -> bytes:
    """Literal translation of OpenEXR ImfZip::compress's pre-pass."""
    size = len(raw)
    tmp = bytearray(size)
    # reorder the pixel data
    t1, t2, ri = 0, (size + 1) // 2, 0
    while True:
        if ri < size:
            tmp[t1] = raw[ri]; t1 += 1; ri += 1
        else:
            break
        if ri < size:
            tmp[t2] = raw[ri]; t2 += 1; ri += 1
        else:
            break
    # predictor
    p = tmp[0]
    for i in range(1, size):
        d = int(tmp[i]) - p + (128 + 256)
        p = tmp[i]
        tmp[i] = d & 0xFF
    return bytes(tmp)


def imfzip_uncompress_scalar(buf: bytes) -> bytes:
    size = len(buf)
    tmp = bytearray(buf)
    for i in range(1, size):
        tmp[i] = (tmp[i - 1] + tmp[i] - 128) & 0xFF
    out = bytearray(size)
    t1, t2, wi = 0, (size + 1) // 2, 0
    while True:
        if wi < size:
            out[wi] = tmp[t1]; t1 += 1; wi += 1
        else:
            break
        if wi < size:
            out[wi] = tmp[t2]; t2 += 1; wi += 1
        else:
            break
    return bytes(out)


class TestZipPrePass:
    def test_matches_imfzip_reference(self):
        rng = np.random.default_rng(0)
        for n in (1, 2, 3, 17, 256, 1001):
            raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            assert _predictor_encode(raw) == imfzip_compress_scalar(raw), n
            enc = imfzip_compress_scalar(raw)
            assert _predictor_decode(enc) == imfzip_uncompress_scalar(enc) \
                == raw, n

    def test_roundtrip_all_compressions(self, tmp_path):
        rng = np.random.default_rng(1)
        chans = {"R": rng.normal(size=(33, 47)).astype(np.float32),
                 "G": rng.normal(size=(33, 47)).astype(np.float32)}
        for comp in ("none", "zips", "zip"):
            p = str(tmp_path / f"c_{comp}.exr")
            write_exr(p, chans, compression=comp)
            back = read_exr(p)
            for n in chans:
                np.testing.assert_array_equal(back[n], chans[n])

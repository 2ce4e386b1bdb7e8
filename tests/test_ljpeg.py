"""Lossless JPEG (SOF3) codec: encoder/decoder round trips, native C++ vs
pure-Python agreement, and compressed (Compression=7) CinemaDNG decode."""
import numpy as np
import pytest

from gyroflow_tpu.utils import ljpeg


def rng_img(h, w, c, bits, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 1 << bits, (h, w, c)).astype(np.uint16)
    return img


class TestRoundTrip:
    @pytest.mark.parametrize("bits", [8, 12, 16])
    @pytest.mark.parametrize("nc", [1, 2])
    def test_python_roundtrip(self, bits, nc):
        img = rng_img(13, 21, nc, bits, bits * 10 + nc)
        enc = ljpeg.encode(img, precision=bits)
        dec = ljpeg.decode(enc)
        np.testing.assert_array_equal(dec, img)

    @pytest.mark.parametrize("pred", [1, 2, 3, 4, 5, 6, 7])
    def test_predictors(self, pred):
        img = rng_img(9, 17, 1, 12, pred)
        enc = ljpeg.encode(img, precision=12, predictor=pred)
        np.testing.assert_array_equal(ljpeg.decode(enc), img)

    @pytest.mark.parametrize("pt", [1, 2, 4])
    def test_point_transform_scales_output(self, pt):
        """T.81 H.2.1: decoded samples are scaled back up by 2^Pt; a decoder
        that ignores Al decodes at 1/2^Pt amplitude."""
        img = (rng_img(9, 13, 1, 12, pt) >> pt) << pt   # drop the lost bits
        enc = ljpeg.encode(img, precision=12, point_transform=pt)
        np.testing.assert_array_equal(ljpeg.decode(enc), img)

    def test_point_transform_native_matches(self):
        from gyroflow_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        img = (rng_img(12, 18, 2, 16, 3) >> 2) << 2
        enc = ljpeg.encode(img, precision=16, point_transform=2)
        np.testing.assert_array_equal(native.ljpeg_decode(enc), img)

    def test_gradient_compresses(self):
        """Smooth data must shrink (the point of the predictor)."""
        y, x = np.mgrid[0:64, 0:96]
        img = ((y * 7 + x * 3) & 0xFFF).astype(np.uint16)[..., None]
        enc = ljpeg.encode(img, precision=12)
        assert len(enc) < img.size * 2 * 0.7


class TestNativeAgreement:
    def test_native_matches_python(self):
        from gyroflow_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        for seed, (h, w, nc, bits) in enumerate(
                [(16, 24, 1, 16), (11, 33, 2, 12), (8, 8, 1, 8)]):
            img = rng_img(h, w, nc, bits, seed)
            enc = ljpeg.encode(img, precision=bits)
            got = native.ljpeg_decode(enc)
            np.testing.assert_array_equal(got, img)
            np.testing.assert_array_equal(got, ljpeg.decode(enc))

    def test_native_rejects_garbage(self):
        from gyroflow_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        with pytest.raises(ValueError):
            native.ljpeg_decode(b"\xff\xd8" + b"\x00" * 64)

    def test_native_survives_mutation_fuzz(self):
        """Bit-flipped and truncated valid streams must error or decode,
        never crash (the decoder parses untrusted camera files)."""
        from gyroflow_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        img = rng_img(8, 12, 2, 12, 9)
        enc = bytearray(ljpeg.encode(img, precision=12))
        rng = np.random.default_rng(0)
        for _ in range(300):
            mut = bytearray(enc)
            for _k in range(rng.integers(1, 4)):
                mut[rng.integers(2, len(mut))] = rng.integers(0, 256)
            try:
                native.ljpeg_decode(bytes(mut))
            except ValueError:
                pass
        for cut in range(2, len(enc), 7):
            try:
                native.ljpeg_decode(bytes(enc[:cut]))
            except ValueError:
                pass


def write_dng_generic(path, entries_vals, payloads):
    """TIFF writer with out-of-line array support for tiled fixtures.
    entries_vals: [(tag, typ, vals)]; payloads appended after the IFD, and
    any vals == ('payload', i) resolves to payload i's absolute offset."""
    import struct
    tfm = {1: "B", 3: "H", 4: "I"}
    tsz = {1: 1, 3: 2, 4: 4}
    entries = sorted(entries_vals, key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4
    # lay out payloads and out-of-line value arrays after the IFD
    extra = bytearray()
    payload_offs = []
    pos = data_off
    for pl in payloads:
        payload_offs.append(pos)
        extra += pl
        pos += len(pl)
    out_of_line = bytearray()

    def resolve(vals):
        return [payload_offs[v[1]] if isinstance(v, tuple) else v
                for v in vals]

    body = bytearray()
    for (tag, typ, vals) in entries:
        vals = resolve(vals)
        packed = struct.pack("<" + tfm[typ] * len(vals), *vals)
        if len(packed) <= 4:
            body += struct.pack("<HHI", tag, typ, len(vals)) + packed.ljust(4, b"\x00")
        else:
            body += struct.pack("<HHI", tag, typ, len(vals)) + \
                struct.pack("<I", pos + len(out_of_line))
            out_of_line += packed
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n) + body + struct.pack("<I", 0)
    assert len(out) == data_off
    out += extra + out_of_line
    with open(path, "wb") as fh:
        fh.write(bytes(out))


class TestTiledDNG:
    def test_tiled_compression7(self, tmp_path):
        from gyroflow_tpu.render.dng_seq import DNGSequenceReader
        rng = np.random.default_rng(5)
        h, w, tw_, th_ = 32, 64, 32, 16
        cfa = rng.integers(0, 4096, (h, w)).astype(np.uint16)
        tiles = []
        for ty in range(h // th_):
            for tx in range(w // tw_):
                block = cfa[ty * th_:(ty + 1) * th_, tx * tw_:(tx + 1) * tw_]
                tiles.append(ljpeg.encode(block.reshape(th_, tw_ // 2, 2),
                                          precision=12))
        entries = [(254, 4, [0]), (256, 4, [w]), (257, 4, [h]), (258, 3, [12]),
                   (259, 3, [7]), (262, 3, [32803]), (277, 3, [1]),
                   (322, 4, [tw_]), (323, 4, [th_]),
                   (324, 4, [("payload", i) for i in range(len(tiles))]),
                   (325, 4, [len(tj) for tj in tiles]),
                   (33422, 1, [0, 1, 1, 2]), (50714, 3, [0]),
                   (50717, 4, [4095])]
        p = tmp_path / "t_0000.dng"
        write_dng_generic(str(p), entries, tiles)
        r = DNGSequenceReader(str(tmp_path / "t_%04d.dng"))
        _, planes = next(iter(r))
        rgb = planes[0]
        assert rgb.shape == (h, w, 3)
        # exact sample check at green sites across tile boundaries
        for (y, x) in ((0, 1), (0, 33), (17, 2), (17, 34)):
            ch = 1 if (y % 2, x % 2) in ((0, 1), (1, 0)) else None
            if ch is None:
                continue
            want = round(cfa[y, x] / 4095.0 * 65535.0)
            assert abs(int(rgb[y, x, ch]) - want) <= 1, (y, x)


class TestLinearizationAndActiveArea:
    def test_lut_and_crop(self, tmp_path):
        from gyroflow_tpu.render.dng_seq import DNGSequenceReader
        h, w = 24, 40
        # stored codes 0..255 with a quadratic linearization LUT and 4-px
        # masked borders
        codes = (np.arange(h * w) % 256).astype(np.uint16).reshape(h, w)
        lut = ((np.arange(256) ** 2) // 64).astype(np.uint16)   # max 1016
        entries = [(254, 4, [0]), (256, 4, [w]), (257, 4, [h]), (258, 3, [16]),
                   (259, 3, [1]), (262, 3, [34892]),            # LinearRaw
                   (277, 3, [1]), (278, 4, [h]),
                   (273, 4, [("payload", 0)]),
                   (279, 4, [codes.size * 2]),
                   (50712, 3, list(lut)),                       # LUT
                   (50714, 3, [0]), (50717, 4, [1016]),
                   (50829, 4, [4, 4, h - 4, w - 4])]            # ActiveArea
        p = tmp_path / "lin_0000.dng"
        write_dng_generic(str(p), entries, [codes.astype("<u2").tobytes()])
        r = DNGSequenceReader(str(tmp_path / "lin_%04d.dng"))
        assert (r.height, r.width) == (h - 8, w - 8)
        _, planes = next(iter(r))
        rgb = planes[0]
        assert rgb.shape == (h - 8, w - 8, 3)
        # value at cropped (0,0) == LUT[code at original (4,4)] normalized
        code = int(codes[4, 4])
        want = round(lut[code] / 1016.0 * 65535.0)
        assert abs(int(rgb[0, 0, 0]) - want) <= 1


class TestCompressedDNG:
    def test_compression7_dng_reads(self, tmp_path):
        import struct

        from gyroflow_tpu.render.dng_seq import DNGSequenceReader
        rng = np.random.default_rng(1)
        h, w = 32, 48
        cfa = rng.integers(0, 4096, (h, w)).astype(np.uint16)
        # 2-component SOF3 layout like CinemaDNG: rows of w samples split
        # into (w/2, 2) interleaved components
        jpg = ljpeg.encode(cfa.reshape(h, w // 2, 2), precision=12)

        def e(entries, tag, typ, vals):
            entries.append((tag, typ, vals))
        entries = []
        e(entries, 254, 4, [0])
        e(entries, 256, 4, [w])
        e(entries, 257, 4, [h])
        e(entries, 258, 3, [12])
        e(entries, 259, 3, [7])          # lossless JPEG
        e(entries, 262, 3, [32803])
        e(entries, 277, 3, [1])
        e(entries, 278, 4, [h])
        e(entries, 33422, 1, [0, 1, 1, 2])
        e(entries, 50714, 3, [0])
        e(entries, 50717, 4, [4095])
        n = len(entries) + 2
        data_off = 8 + 2 + n * 12 + 4
        e(entries, 273, 4, [data_off])
        e(entries, 279, 4, [len(jpg)])
        entries.sort(key=lambda x: x[0])
        out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
        out += struct.pack("<H", len(entries))
        tfm = {1: "B", 3: "H", 4: "I"}
        for (tag, typ, vals) in entries:
            packed = struct.pack("<" + tfm[typ] * len(vals), *vals).ljust(4, b"\x00")
            out += struct.pack("<HHI", tag, typ, len(vals)) + packed
        out += struct.pack("<I", 0)
        out += jpg
        p = tmp_path / "c7_0000.dng"
        p.write_bytes(bytes(out))

        r = DNGSequenceReader(str(tmp_path / "c7_%04d.dng"))
        _, planes = next(iter(r))
        rgb = planes[0]
        assert rgb.shape == (h, w, 3)
        # green CFA site value survives normalization exactly
        want = round(cfa[0, 1] / 4095.0 * 65535.0)
        assert abs(int(rgb[0, 1, 1]) - want) <= 1

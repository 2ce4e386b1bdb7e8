"""Media pipeline: 10-bit y4m end-to-end, chroma plane rects vs oracle,
EXR float sequences, raw-format packing, ffmpeg pipe plumbing (stub binary)."""
import json
import os
import stat
import sys

import numpy as np
import pytest

import oracle
from test_end_to_end import gcsv_path, DUR_S  # noqa: F401

from gyroflow_tpu.core.manager import StabilizationManager
from gyroflow_tpu.render.formats import RAW_FORMATS
from gyroflow_tpu.render.renderer import RenderOptions, render
from gyroflow_tpu.render.y4m_io import Y4MReader, Y4MWriter

VW, VH, VFPS, VFRAMES = 128, 96, 30.0, 8


def make_manager(gcsv, w=VW, h=VH):
    mgr = StabilizationManager()
    mgr.init_from_video_data(DUR_S * 1000.0, VFPS, int(DUR_S * VFPS), (w, h))
    mgr.load_gyro_data(gcsv)
    mgr.recompute_blocking()
    return mgr


@pytest.fixture(scope="module")
def y4m10_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("y4m") / "in10.y4m")
    w = Y4MWriter(p, VW, VH, VFPS, "yuv420p10le")
    rng = np.random.default_rng(1)
    base_y = rng.integers(0, 1024, (VH * 2, VW * 2, 1)).astype("<u2")
    base_u = rng.integers(0, 1024, (VH, VW, 1)).astype("<u2")
    base_v = rng.integers(0, 1024, (VH, VW, 1)).astype("<u2")
    for i in range(VFRAMES):
        oy, ox = 10 + i, 16 + 2 * i
        w.write_planes([base_y[oy:oy + VH, ox:ox + VW],
                        base_u[oy // 2:oy // 2 + VH // 2, ox // 2:ox // 2 + VW // 2],
                        base_v[oy // 2:oy // 2 + VH // 2, ox // 2:ox // 2 + VW // 2]])
    w.close()
    return p


class TestFormats:
    @pytest.mark.parametrize("name", ["yuv420p", "yuv420p10le", "yuv422p10le",
                                      "yuv444p16le", "gray16le", "rgb48le",
                                      "gbrpf32le", "nv12", "p010le"])
    def test_pack_unpack_roundtrip(self, name):
        fmt = RAW_FORMATS[name]
        rng = np.random.default_rng(0)
        planes = []
        for (ph, pw, ch) in fmt.plane_shapes(64, 48):
            if fmt.dtype == np.float32:
                planes.append(rng.normal(size=(ph, pw, ch)).astype("<f4"))
            else:
                planes.append(rng.integers(0, int(fmt.max_value) + 1,
                                           (ph, pw, ch)).astype(fmt.dtype))
        buf = fmt.pack(planes)
        assert len(buf) == fmt.frame_bytes(64, 48)
        back = fmt.unpack(buf, 64, 48)
        for a, b in zip(planes, back):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("name", ["nv12", "p010le"])
    def test_semiplanar_groups(self, name):
        """NV12/P010 semi-planar: Luma + interleaved-UV plane groups map to
        the kernel's (Y plane 0, UV pair plane 1) like rendering/mod.rs
        NV12 -> (Luma8, UV8), P010 -> (Luma16, UV16)."""
        from gyroflow_tpu.render.renderer import (_plane_groups,
                                                  _plane_backgrounds,
                                                  _ungroup_planes)
        fmt = RAW_FORMATS[name]
        rng = np.random.default_rng(1)
        planes = [rng.integers(0, int(fmt.max_value) + 1, (ph, pw, ch))
                  .astype(fmt.dtype)
                  for (ph, pw, ch) in fmt.plane_shapes(64, 48)]
        groups = _plane_groups(fmt, planes)
        assert [g[1] for g in groups] == [0, 1]          # plane indices
        assert groups[0][0].shape == (48, 64, 1)
        assert groups[1][0].shape == (24, 32, 2)          # interleaved UV pair
        back = _ungroup_planes(fmt, [g[0] for g in groups])
        for a, b in zip(planes, back):
            np.testing.assert_array_equal(a, b)
        bgs = _plane_backgrounds(fmt, (0.2, 0.4, 0.6, 1.0), True)
        assert bgs[0].shape[-1] == 1 and bgs[1].shape[-1] == 2


class TestY4M10BitRender:
    def test_end_to_end_10bit(self, y4m10_path, gcsv_path, tmp_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        out = str(tmp_path / "out10.y4m")
        stats = render(mgr, y4m10_path, out, RenderOptions(interpolation=2))
        assert stats["frames"] == VFRAMES
        assert stats["pix_fmt"] == "yuv420p10le"
        r = Y4MReader(out)
        assert (r.width, r.height, r.bit_depth) == (VW, VH, 10)
        n = 0
        for ts, planes in r:
            assert planes[0].shape == (VH, VW, 1)
            assert planes[1].shape == (VH // 2, VW // 2, 1)
            assert int(planes[0].max()) <= 1023
            n += 1
        r.close()
        assert n == VFRAMES

    def test_luma_matches_direct_process(self, y4m10_path, gcsv_path, tmp_path):  # noqa: F811
        """The rendered luma plane == process_pixels on the same plane."""
        mgr = make_manager(gcsv_path)
        out = str(tmp_path / "outp.y4m")
        render(mgr, y4m10_path, out, RenderOptions(interpolation=2))
        rin = Y4MReader(y4m10_path)
        rout = Y4MReader(out)
        ts, planes_in = next(iter(rin))
        _, planes_out = next(iter(rout))
        rin.close(); rout.close()
        direct, _ = mgr.process_pixels(ts, planes_in[0].astype(np.float32),
                                       interpolation=2, use_pallas=False,
                                       plane_index=0, max_pixel_value=1023.0,
                                       plane_rects=True)
        direct = np.clip(np.rint(np.asarray(direct)), 0, 1023).astype(np.uint16)
        np.testing.assert_allclose(planes_out[0].astype(np.int32),
                                   direct.astype(np.int32), atol=1)


class TestTrimRangesRender:
    """Multiple trim ranges render concatenated (render_queue.rs:195); with
    pad_with_black the full timeline keeps its length and out-of-range frames
    fill with the background color (render_queue.rs:87, mod.rs:452-453)."""

    def _frames(self, path):
        r = Y4MReader(path)
        frames = [planes for _ts, planes in r]
        r.close()
        return frames

    def test_multi_range_concatenates(self, y4m10_path, gcsv_path, tmp_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        full_out = str(tmp_path / "full.y4m")
        render(mgr, y4m10_path, full_out, RenderOptions(interpolation=2))
        full = self._frames(full_out)

        mgr.params.trim_ranges = [(0.0, 0.25), (0.5, 0.75)]
        out = str(tmp_path / "ranges.y4m")
        render(mgr, y4m10_path, out, RenderOptions(interpolation=2))
        got = self._frames(out)
        # ranges [(0,2)] + [(4,6)] inclusive -> frames 0,1,2,4,5,6
        keep = [0, 1, 2, 4, 5, 6]
        assert len(got) == len(keep)
        for g, k in zip(got, keep):
            np.testing.assert_array_equal(g[0], full[k][0])

    def test_pad_with_black_keeps_timeline(self, y4m10_path, gcsv_path,
                                           tmp_path):  # noqa: F811
        mgr = make_manager(gcsv_path)
        mgr.params.trim_ranges = [(0.0, 0.25), (0.5, 0.75)]
        out = str(tmp_path / "padded.y4m")
        stats = render(mgr, y4m10_path, out,
                       RenderOptions(interpolation=2, pad_with_black=True))
        got = self._frames(out)
        assert len(got) == VFRAMES and stats["frames"] == VFRAMES
        # out-of-range frames are constant background color
        from gyroflow_tpu.render.renderer import _plane_backgrounds
        from gyroflow_tpu.render.formats import RAW_FORMATS
        bgs = _plane_backgrounds(RAW_FORMATS["yuv420p10le"],
                                 mgr.params.background, True)
        for k in (3, 7):
            y = got[k][0]
            assert np.ptp(y) == 0
            assert abs(int(y.flat[0]) - float(bgs[0].reshape(-1)[0]) * 1023) <= 1
        # in-range frames are real stabilized content (match a full render)
        mgr.params.trim_ranges = []
        full_out = str(tmp_path / "full2.y4m")
        render(mgr, y4m10_path, full_out, RenderOptions(interpolation=2))
        full = self._frames(full_out)
        for k in (0, 2, 4, 6):
            np.testing.assert_array_equal(got[k][0], full[k][0])

    def test_export_trims_separately(self, y4m10_path, gcsv_path, tmp_path):  # noqa: F811
        """Each trim range renders to its own -00N-suffixed file
        (render_queue.rs:1072, mod.rs:697-703)."""
        mgr = make_manager(gcsv_path)
        mgr.params.trim_ranges = [(0.0, 0.25), (0.5, 0.75)]
        out = str(tmp_path / "sep.y4m")
        stats = render(mgr, y4m10_path, out,
                       RenderOptions(interpolation=2,
                                     export_trims_separately=True))
        f1 = self._frames(str(tmp_path / "sep-001.y4m"))
        f2 = self._frames(str(tmp_path / "sep-002.y4m"))
        assert len(f1) == 3 and len(f2) == 3      # (0..2) and (4..6) inclusive
        assert stats["frames"] == 6
        assert not os.path.exists(out)            # only suffixed outputs
        mgr.params.trim_ranges = []
        full_out = str(tmp_path / "fullsep.y4m")
        render(mgr, y4m10_path, full_out, RenderOptions(interpolation=2))
        full = self._frames(full_out)
        np.testing.assert_array_equal(f2[0][0], full[4][0])


class TestChromaPlaneRects:
    def test_uv_plane_matches_oracle_rects(self, gcsv_path):  # noqa: F811
        """Chroma processed with luma geometry + rects == oracle with the
        same source/output rects + out_size (HAS_SOURCE_RECT semantics)."""
        mgr = make_manager(gcsv_path)
        rng = np.random.default_rng(2)
        uv = rng.integers(0, 1024, (VH // 2, VW // 2, 2)).astype(np.float32)
        ts = int(1e6 / VFPS * 2)
        out, _ = mgr.process_pixels(ts, uv, interpolation=2, use_pallas=False,
                                    plane_index=1, max_pixel_value=1023.0,
                                    plane_rects=True)
        out = np.asarray(out)
        assert out.shape == (VH // 2, VW // 2, 2)

        ft = mgr.frame_transform_at(ts / 1000.0)
        p = oracle.default_params(VW, VH, VW, VH)
        dyn = ft.kernel_dyn
        p.update(f=tuple(np.asarray(dyn.f)), c=tuple(np.asarray(dyn.c)),
                 k=list(np.asarray(dyn.k)), fov=float(dyn.fov),
                 r_limit=float(dyn.r_limit),
                 translation2d=tuple(np.asarray(dyn.translation2d)),
                 max_pixel_value=1023.0, pixel_value_limit=1023.0,
                 flags=ft.kernel_cfg.flags, plane_index=1,
                 distortion_model=ft.kernel_cfg.distortion_model,
                 background_mode=ft.kernel_cfg.background_mode,
                 source_rect=(0, 0, VW // 2, VH // 2),
                 output_rect=(0, 0, VW // 2, VH // 2),
                 out_size=(VW // 2, VH // 2),
                 interpolation=2)
        ref = oracle.undistort_image(uv.astype(np.float64), p, ft.matrices)
        np.testing.assert_allclose(out, ref, atol=1.0)


class TestEXRSequence:
    def test_end_to_end_float(self, gcsv_path, tmp_path):  # noqa: F811
        from gyroflow_tpu.utils.exr import read_exr, write_exr
        indir = tmp_path / "seq"
        indir.mkdir()
        rng = np.random.default_rng(3)
        frames = []
        for i in range(4):
            ch = {n: rng.uniform(0, 1, (VH, VW)).astype(np.float32)
                  for n in ("R", "G", "B")}
            ch["A"] = np.ones((VH, VW), np.float32)
            write_exr(str(indir / f"frame_{i:04d}.exr"), ch)
            frames.append(ch)
        mgr = make_manager(gcsv_path)
        # underwater refraction end-to-end (eval config 4)
        mgr.params.light_refraction_coefficient = 1.33
        mgr.invalidate()
        mgr.recompute_blocking()
        outdir = tmp_path / "out"
        stats = render(mgr, str(indir), str(outdir),
                       RenderOptions(interpolation=2))
        assert stats["frames"] == 4
        outs = sorted(os.listdir(outdir))
        assert len(outs) == 4
        ch0 = read_exr(str(outdir / outs[0]))
        assert set(ch0) == {"R", "G", "B", "A"}
        assert ch0["R"].shape == (VH, VW)
        assert np.isfinite(ch0["R"]).all()

        # parity: rendered frame 0 == direct float process_pixels (refraction on)
        rgba = np.stack([frames[0][n] for n in ("R", "G", "B", "A")], axis=-1)
        direct, _ = mgr.process_pixels(0, rgba.astype(np.float32),
                                       interpolation=2, use_pallas=False,
                                       max_pixel_value=1.0, plane_rects=True)
        got = np.stack([ch0[n] for n in ("R", "G", "B", "A")], axis=-1)
        np.testing.assert_allclose(got, np.asarray(direct), atol=1e-5)


class TestPNGSequence:
    def test_end_to_end_16bit(self, gcsv_path, tmp_path):  # noqa: F811
        import cv2
        indir = tmp_path / "pngseq"
        indir.mkdir()
        rng = np.random.default_rng(4)
        frames = []
        for i in range(4):
            img = rng.integers(0, 65536, (VH, VW, 3)).astype(np.uint16)
            assert cv2.imwrite(str(indir / f"f_{i:04d}.png"), img[..., ::-1])
            frames.append(img)
        mgr = make_manager(gcsv_path)
        outpat = str(tmp_path / "out" / "o_%04d.png")
        os.makedirs(str(tmp_path / "out"))
        stats = render(mgr, str(indir / "f_%04d.png"), outpat,
                       RenderOptions(interpolation=2))
        assert stats["frames"] == 4
        assert stats["pix_fmt"] == "rgb48le"
        got = cv2.imread(outpat % 0, cv2.IMREAD_UNCHANGED)[..., ::-1]
        assert got.dtype == np.uint16 and got.shape == (VH, VW, 3)

        # parity: rendered frame 0 == direct process_pixels on the same frame
        direct, _ = mgr.process_pixels(0, frames[0].astype(np.float32),
                                       interpolation=2, use_pallas=False,
                                       max_pixel_value=65535.0, plane_rects=True)
        direct = np.clip(np.rint(np.asarray(direct)), 0, 65535).astype(np.uint16)
        np.testing.assert_allclose(got.astype(np.int64),
                                   direct.astype(np.int64), atol=1)

    def test_glob_and_dir_inputs(self, tmp_path):
        import cv2
        from gyroflow_tpu.render.img_seq import ImageSequenceReader
        d = tmp_path / "g"
        d.mkdir()
        for i in range(3):
            cv2.imwrite(str(d / f"a_{i}.png"),
                        np.full((8, 12), i * 10, np.uint8))
        for src in (str(d), str(d / "*.png")):
            r = ImageSequenceReader(src)
            assert (r.frame_count, r.width, r.height) == (3, 12, 8)
            assert r.pix_fmt == "gray"
            n = sum(1 for _ in r)
            assert n == 3
            r.close()

    def test_arbitrary_start_number_and_project_fps(self, gcsv_path, tmp_path):  # noqa: F811
        """Sequences starting at e.g. 1000 resolve via the glob fallback, and
        the project's image_sequence_fps drives frame timestamps
        (lib.rs:1293, InputFile:61-62)."""
        import cv2
        from gyroflow_tpu.core.project_file import (export_gyroflow_data,
                                                    import_gyroflow_data)
        from gyroflow_tpu.render.img_seq import ImageSequenceReader
        for i in range(3):
            cv2.imwrite(str(tmp_path / f"s_{1000 + i:04d}.png"),
                        np.full((VH, VW), 100 + i, np.uint8))
        r = ImageSequenceReader(str(tmp_path / "s_%04d.png"))
        assert r.frame_count == 3
        r.close()

        mgr = make_manager(gcsv_path)
        mgr.image_sequence_start = 1000
        mgr.image_sequence_fps = 12.5
        m2 = StabilizationManager()
        m2.init_from_video_data(DUR_S * 1000.0, VFPS, int(DUR_S * VFPS), (VW, VH))
        import_gyroflow_data(m2, export_gyroflow_data(mgr), blocking=True)
        assert m2.image_sequence_start == 1000
        assert m2.image_sequence_fps == 12.5

        outpat = str(tmp_path / "o_%04d.png")
        stats = render(m2, str(tmp_path / "s_%04d.png"), outpat,
                       RenderOptions(interpolation=2))
        assert stats["frames"] == 3

    def test_yuv_to_png_conversion(self, y4m10_path, gcsv_path, tmp_path):  # noqa: F811
        """10-bit YUV420 input rendered to a PNG sequence converts to 16-bit
        RGB on the host (the reference's ffmpeg PNG-encode conversion)."""
        import cv2
        mgr = make_manager(gcsv_path)
        outpat = str(tmp_path / "c_%04d.png")
        stats = render(mgr, y4m10_path, outpat, RenderOptions(interpolation=2))
        assert stats["frames"] == VFRAMES
        img = cv2.imread(outpat % 0, cv2.IMREAD_UNCHANGED)
        assert img.dtype == np.uint16
        assert img.shape == (VH, VW, 3)
        assert img.max() > 1024   # scaled to 16-bit range, not left at 10-bit


def _write_dng(path, cfa16, bits=16, pattern=b"\x00\x01\x01\x02"):
    """Minimal little-endian uncompressed CFA DNG (one strip, one IFD)."""
    import struct
    h, w = cfa16.shape
    if bits == 16:
        data = cfa16.astype("<u2").tobytes()
    elif bits == 12:
        flat = cfa16.astype(np.uint16).reshape(-1)
        if flat.size % 2:
            flat = np.append(flat, 0)
        b = np.empty(flat.size // 2 * 3, np.uint8)
        b[0::3] = (flat[0::2] >> 4).astype(np.uint8)
        b[1::3] = (((flat[0::2] & 0xF) << 4) | (flat[1::2] >> 8)).astype(np.uint8)
        b[2::3] = (flat[1::2] & 0xFF).astype(np.uint8)
        data = b.tobytes()
    entries = []  # (tag, type, count, value_or_bytes)
    white = (1 << bits) - 1

    def e(tag, typ, vals):
        entries.append((tag, typ, vals))
    e(254, 4, [0])          # NewSubfileType: full-res
    e(256, 4, [w])
    e(257, 4, [h])
    e(258, 3, [bits])
    e(259, 3, [1])          # uncompressed
    e(262, 3, [32803])      # CFA
    e(277, 3, [1])
    e(278, 4, [h])
    e(33422, 1, list(pattern))  # CFAPattern
    e(50714, 3, [0])        # BlackLevel
    e(50717, 4, [white])    # WhiteLevel
    # layout: header(8) + IFD + data
    n = len(entries) + 2    # + strip offset/counts added below
    ifd_size = 2 + n * 12 + 4
    data_off = 8 + ifd_size
    e(273, 4, [data_off])   # StripOffsets
    e(279, 4, [len(data)])  # StripByteCounts
    entries.sort(key=lambda x: x[0])
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(entries))
    tsz = {1: 1, 3: 2, 4: 4}
    tfm = {1: "B", 3: "H", 4: "I"}
    for (tag, typ, vals) in entries:
        packed = struct.pack("<" + tfm[typ] * len(vals), *vals)
        packed = packed.ljust(4, b"\x00")
        assert len(packed) <= 4, "inline values only in this fixture"
        out += struct.pack("<HHI", tag, typ, len(vals)) + packed
    out += struct.pack("<I", 0)
    assert len(out) == data_off
    out += data
    with open(path, "wb") as fh:
        fh.write(bytes(out))


class TestDNGSequence:
    def test_flat_field_demosaics_flat(self, tmp_path):
        from gyroflow_tpu.render.dng_seq import DNGSequenceReader
        # R=4000, G=2000, B=1000 flat field in RGGB
        cfa = np.zeros((32, 48), np.uint16)
        cfa[0::2, 0::2] = 4000
        cfa[0::2, 1::2] = 2000
        cfa[1::2, 0::2] = 2000
        cfa[1::2, 1::2] = 1000
        p = tmp_path / "f_0000.dng"
        _write_dng(str(p), cfa)
        r = DNGSequenceReader(str(tmp_path / "f_%04d.dng"))
        assert (r.width, r.height, r.pix_fmt) == (48, 32, "rgb48le")
        _, planes = next(iter(r))
        rgb = planes[0].astype(np.float32) / 65535.0
        inner = rgb[4:-4, 4:-4]
        np.testing.assert_allclose(inner[..., 0], 4000 / 65535, atol=2e-3)
        np.testing.assert_allclose(inner[..., 1], 2000 / 65535, atol=2e-3)
        np.testing.assert_allclose(inner[..., 2], 1000 / 65535, atol=2e-3)
        r.close()

    def test_12bit_packed(self, tmp_path):
        from gyroflow_tpu.render.dng_seq import DNGSequenceReader
        rng = np.random.default_rng(0)
        cfa = rng.integers(0, 4096, (16, 24)).astype(np.uint16)
        _write_dng(str(tmp_path / "p_0000.dng"), cfa, bits=12)
        r = DNGSequenceReader(str(tmp_path / "p_%04d.dng"))
        _, planes = next(iter(r))
        assert planes[0].shape == (16, 24, 3)
        assert planes[0].dtype == np.uint16
        # green at a green site survives normalization exactly
        gy, gx = 0, 1
        want = cfa[gy, gx] / 4095.0 * 65535.0
        assert abs(float(planes[0][gy, gx, 1]) - want) < 80.0

    def test_end_to_end_render(self, gcsv_path, tmp_path):  # noqa: F811
        import cv2
        rng = np.random.default_rng(5)
        for i in range(3):
            cfa = rng.integers(0, 65536, (VH, VW)).astype(np.uint16)
            _write_dng(str(tmp_path / f"d_{i:04d}.dng"), cfa)
        mgr = make_manager(gcsv_path)
        outpat = str(tmp_path / "o_%04d.png")
        stats = render(mgr, str(tmp_path / "d_%04d.dng"), outpat,
                       RenderOptions(interpolation=2))
        assert stats["frames"] == 3
        img = cv2.imread(outpat % 0, cv2.IMREAD_UNCHANGED)
        assert img is not None and img.dtype == np.uint16
        assert img.shape == (VH, VW, 3)


class TestCrossFormatRenders:
    def test_depth_rescale_10_to_8(self, y4m10_path, gcsv_path, tmp_path):  # noqa: F811
        """10-bit source rendered to an 8-bit y4m scales codes by 255/1023."""
        mgr = make_manager(gcsv_path)
        out10 = str(tmp_path / "o10.y4m")
        render(mgr, y4m10_path, out10, RenderOptions(interpolation=2))
        out8 = str(tmp_path / "o8.y4m")
        render(mgr, y4m10_path, out8,
               RenderOptions(interpolation=2, pix_fmt="yuv420p"))
        r10, r8 = Y4MReader(out10), Y4MReader(out8)
        _, p10 = next(iter(r10))
        _, p8 = next(iter(r8))
        r10.close(); r8.close()
        assert p8[0].dtype == np.uint8
        m10 = float(p10[0].mean()) / 1023.0
        m8 = float(p8[0].mean()) / 255.0
        assert abs(m10 - m8) < 0.01, (m10, m8)

    def test_exr_to_png_keeps_channels(self, gcsv_path, tmp_path):  # noqa: F811
        from gyroflow_tpu.utils.exr import write_exr
        import cv2
        indir = tmp_path / "eseq"
        indir.mkdir()
        rng = np.random.default_rng(6)
        for i in range(2):
            ch = {"R": np.full((VH, VW), 0.8, np.float32),
                  "G": np.full((VH, VW), 0.4, np.float32),
                  "B": np.full((VH, VW), 0.1, np.float32)}
            write_exr(str(indir / f"f_{i:04d}.exr"), ch)
        mgr = make_manager(gcsv_path)
        outpat = str(tmp_path / "p_%04d.png")
        stats = render(mgr, str(indir / "f_%04d.exr"), outpat,
                       RenderOptions(interpolation=2))
        assert stats["frames"] == 2
        img = cv2.imread(outpat % 0, cv2.IMREAD_UNCHANGED)
        assert img is not None and img.ndim == 3 and img.shape[-1] == 3
        # BGR on disk: R~0.8 lands in channel 2, B~0.1 in channel 0
        c = img[VH // 2, VW // 2].astype(np.float64) / 65535.0
        assert c[2] > 0.7 and c[1] == pytest.approx(0.4, abs=0.05) \
            and c[0] < 0.2, c

    def test_yuv_to_exr_converts(self, y4m10_path, gcsv_path, tmp_path):  # noqa: F811
        from gyroflow_tpu.utils.exr import read_exr
        mgr = make_manager(gcsv_path)
        outdir = tmp_path / "exrs"
        stats = render(mgr, y4m10_path, str(outdir),
                       RenderOptions(interpolation=2))
        assert stats["frames"] == VFRAMES
        files = sorted(os.listdir(outdir))
        ch = read_exr(str(outdir / files[0]))
        assert set(ch) >= {"R", "G", "B"}
        # full-res channels in 0..1 (conversion, not raw YUV planes)
        assert ch["R"].shape == (VH, VW)
        assert 0.0 <= float(ch["R"].min()) and float(ch["R"].max()) <= 1.0


class TestCLIY4M:
    def test_cli_stabilizes_y4m_10bit(self, y4m10_path, gcsv_path, capsys):  # noqa: F811
        from gyroflow_tpu import cli
        rc = cli.main([y4m10_path, "-g", gcsv_path, "-f",
                       "-p", '{"interpolation": 2}'])
        assert rc == 0
        out = os.path.splitext(y4m10_path)[0] + "_stabilized.y4m"
        assert os.path.exists(out)
        r = Y4MReader(out)
        assert (r.bit_depth, r.pix_fmt) == (10, "yuv420p10le")
        assert r.frame_count == VFRAMES
        r.close()


FAKE_FFPROBE = """#!%PY%
import json, sys
print(json.dumps({"streams": [{"width": 64, "height": 48,
  "r_frame_rate": "30/1", "nb_frames": "3", "pix_fmt": "yuv420p10le",
  "duration": "0.1"}]}))
"""

FAKE_FFMPEG = """#!%PY%
import sys, os
import numpy as np
args = sys.argv[1:]
if "-encoders" in args:  # discovery mode (ffmpeg_hw.rs equivalent)
    print(" V....D libx264       H.264")
    print(" V....D h264_nvenc    NVIDIA NVENC H.264")
    print(" V....D libx265       H.265")
    sys.exit(0)
if "null" in args:       # functional hw-encoder probe: pretend it works
    sys.exit(0)
if "pipe:1" in args:   # decode mode: emit 3 deterministic raw frames
    fb = 64*48*2 + 2*(32*24*2)
    out = sys.stdout.buffer
    for i in range(3):
        rng = np.random.default_rng(i)
        out.write(rng.integers(0, 1024, fb // 2).astype("<u2").tobytes())
    out.flush()
else:                   # encode mode: read raw stdin, dump to the output file
    data = sys.stdin.buffer.read()
    with open(args[-1], "wb") as f:
        f.write(b"FAKEENC!" + len(data).to_bytes(8, "little") + data)
"""


class TestFFmpegPipes:
    @pytest.fixture()
    def stub_bins(self, tmp_path, monkeypatch):
        for name, body in (("ffmpeg", FAKE_FFMPEG), ("ffprobe", FAKE_FFPROBE)):
            p = tmp_path / name
            p.write_text(body.replace("%PY%", sys.executable))
            p.chmod(p.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
        import gyroflow_tpu.render.ffmpeg_io as fio
        monkeypatch.setattr(fio, "FFMPEG", str(tmp_path / "ffmpeg"))
        monkeypatch.setattr(fio, "FFPROBE", str(tmp_path / "ffprobe"))
        return fio

    def test_reader_pipes_planes(self, stub_bins):
        r = stub_bins.FFmpegReader("dummy.mp4")
        assert (r.width, r.height, r.pix_fmt) == (64, 48, "yuv420p10le")
        frames = list(r)
        r.close()
        assert len(frames) == 3
        ts, planes = frames[0]
        assert planes[0].shape == (48, 64, 1)
        assert planes[1].shape == (24, 32, 1)
        rng = np.random.default_rng(0)
        fb = 64 * 48 + 2 * (32 * 24)
        expect = rng.integers(0, 1024, fb).astype("<u2")
        np.testing.assert_array_equal(planes[0].ravel(), expect[:64 * 48])

    def test_writer_pipes_and_encodes(self, stub_bins, tmp_path):
        out = str(tmp_path / "enc.mp4")
        w = stub_bins.FFmpegWriter(out, 64, 48, 30.0, "yuv420p10le", "h265",
                                   bitrate_mbps=10.0)
        planes = [np.full((48, 64, 1), 512, "<u2"),
                  np.full((24, 32, 1), 100, "<u2"),
                  np.full((24, 32, 1), 900, "<u2")]
        for _ in range(2):
            w.write_planes(planes)
        w.close()
        blob = open(out, "rb").read()
        assert blob[:8] == b"FAKEENC!"
        n = int.from_bytes(blob[8:16], "little")
        fmt = RAW_FORMATS["yuv420p10le"]
        assert n == 2 * fmt.frame_bytes(64, 48)
        back = fmt.unpack(blob[16:16 + fmt.frame_bytes(64, 48)], 64, 48)
        np.testing.assert_array_equal(back[0], planes[0])

    def test_hw_encoder_discovery(self, stub_bins):
        """use_gpu picks an advertised + probe-verified hardware encoder;
        software otherwise (ffmpeg_hw.rs encoder discovery)."""
        stub_bins._ENCODER_CACHE.clear()
        stub_bins._HW_WORKS_CACHE.clear()
        encs = stub_bins.available_encoders()
        assert "h264_nvenc" in encs and "libx264" in encs
        assert stub_bins._pick_encoder("h264", "libx264", True) == "h264_nvenc"
        assert stub_bins._pick_encoder("h264", "libx264", False) == "libx264"
        # hw h264 is 8-bit only: 10-bit renders stay on the software encoder
        assert stub_bins._pick_encoder("h264", "libx264", True,
                                       ten_bit=True) == "libx264"
        # stub advertises no hevc hw encoder -> software fallback
        assert stub_bins._pick_encoder("hevc", "libx265", True) == "libx265"
        # listed-but-broken encoder (probe fails) falls back to software
        stub_bins._HW_WORKS_CACHE["h264_nvenc"] = False
        assert stub_bins._pick_encoder("h264", "libx264", True) == "libx264"
        stub_bins._HW_WORKS_CACHE.clear()
        # pix_fmt pairing: hw hevc 10-bit takes p010le, software keeps planar
        assert stub_bins._encoder_pix_fmt("hevc_nvenc", True) == "p010le"
        assert stub_bins._encoder_pix_fmt("libx265", True) == "yuv420p10le"
        assert stub_bins._encoder_pix_fmt("h264_nvenc", False) == "yuv420p"


class TestAudioTranscodeCommand:
    """FFmpegWriter builds the right -c:a arguments (ffmpeg_audio.rs
    semantics) — verified via the stub-binary command line."""

    @pytest.fixture()
    def stub_bins(self, tmp_path, monkeypatch):
        for name, body in (("ffmpeg", FAKE_FFMPEG), ("ffprobe", FAKE_FFPROBE)):
            p = tmp_path / name
            p.write_text(body.replace("%PY%", sys.executable))
            p.chmod(p.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
        import gyroflow_tpu.render.ffmpeg_io as fio
        monkeypatch.setattr(fio, "FFMPEG", str(tmp_path / "ffmpeg"))
        monkeypatch.setattr(fio, "FFPROBE", str(tmp_path / "ffprobe"))
        return fio

    def test_pcm_source_to_mp4_transcodes(self, stub_bins, tmp_path,
                                          monkeypatch):
        monkeypatch.setattr(stub_bins, "probe_audio_codec",
                            lambda p: "pcm_s16le")
        captured = {}
        real_popen = stub_bins.subprocess.Popen

        def spy(cmd, **kw):
            captured["cmd"] = cmd
            return real_popen(cmd, **kw)

        monkeypatch.setattr(stub_bins.subprocess, "Popen", spy)
        out = str(tmp_path / "enc.mp4")
        w = stub_bins.FFmpegWriter(out, 64, 48, 30.0, "yuv420p", "h264",
                                   audio_from="src.mov")
        w.write_planes([np.zeros((48, 64, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8)])
        w.close()
        cmd = captured["cmd"]
        i = cmd.index("-c:a")
        assert cmd[i + 1] == "aac"
        assert "-af" in cmd and "aresample=async=1" in cmd

    def test_trim_range_seeks_audio_input(self, stub_bins, tmp_path,
                                          monkeypatch):
        """Trimmed renders pass -ss/-t as INPUT options on the audio source
        (rendering/mod.rs:279 proc.ranges_ms trims audio to the range)."""
        monkeypatch.setattr(stub_bins, "probe_audio_codec", lambda p: "aac")
        captured = {}
        real_popen = stub_bins.subprocess.Popen

        def spy(cmd, **kw):
            captured["cmd"] = cmd
            return real_popen(cmd, **kw)

        monkeypatch.setattr(stub_bins.subprocess, "Popen", spy)
        out = str(tmp_path / "enc3.mp4")
        w = stub_bins.FFmpegWriter(out, 64, 48, 30.0, "yuv420p", "h264",
                                   audio_from="src.mp4",
                                   audio_offset_s=1.5, audio_duration_s=2.0)
        w.write_planes([np.zeros((48, 64, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8)])
        w.close()
        cmd = captured["cmd"]
        ai = cmd.index("src.mp4")
        ss = cmd.index("-ss")
        tt = cmd.index("-t")
        assert ss < ai and tt < ai, cmd          # input-side options
        assert cmd[ss + 1] == "1.500000" and cmd[tt + 1] == "2.000000"

    def test_advanced_encoder_options(self, stub_bins, tmp_path, monkeypatch):
        """keyframe_distance -> -g, metadata comment, and free-form encoder
        options (render_queue.rs:83,104-123; mod.rs:387)."""
        captured = {}
        real_popen = stub_bins.subprocess.Popen

        def spy(cmd, **kw):
            captured["cmd"] = cmd
            return real_popen(cmd, **kw)

        monkeypatch.setattr(stub_bins.subprocess, "Popen", spy)
        out = str(tmp_path / "enc5.mp4")
        w = stub_bins.FFmpegWriter(
            out, 64, 48, 30.0, "yuv420p", "h264",
            encoder_options='-preset slow -x264-params "keyint=60"',
            keyframe_distance=2.0, metadata_comment="hello world")
        w.write_planes([np.zeros((48, 64, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8)])
        w.close()
        cmd = captured["cmd"]
        assert cmd[cmd.index("-g") + 1] == "60"           # 30 fps * 2 s
        assert cmd[cmd.index("-metadata") + 1] == "comment=hello world"
        assert cmd[cmd.index("-preset") + 1] == "slow"
        assert cmd[cmd.index("-x264-params") + 1] == "keyint=60"

    def test_preserve_other_tracks_maps_all_streams(self, stub_bins, tmp_path,
                                                    monkeypatch):
        """preserve_other_tracks maps every non-video source stream and
        stream-copies data/subtitles (ffmpeg_processor.rs:300-346)."""
        monkeypatch.setattr(stub_bins, "probe_audio_codec", lambda p: "aac")
        captured = {}
        real_popen = stub_bins.subprocess.Popen

        def spy(cmd, **kw):
            captured["cmd"] = cmd
            return real_popen(cmd, **kw)

        monkeypatch.setattr(stub_bins.subprocess, "Popen", spy)
        out = str(tmp_path / "enc4.mp4")
        w = stub_bins.FFmpegWriter(out, 64, 48, 30.0, "yuv420p", "h264",
                                   audio_from="src.mp4",
                                   preserve_other_tracks=True)
        w.write_planes([np.zeros((48, 64, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8)])
        w.close()
        cmd = captured["cmd"]
        maps = [cmd[i + 1] for i, a in enumerate(cmd) if a == "-map"]
        assert maps == ["0:v", "1", "-1:v"], maps
        assert "-copy_unknown" in cmd
        assert cmd[cmd.index("-c:d") + 1] == "copy"

    def test_compatible_source_copies(self, stub_bins, tmp_path, monkeypatch):
        monkeypatch.setattr(stub_bins, "probe_audio_codec", lambda p: "aac")
        captured = {}
        real_popen = stub_bins.subprocess.Popen

        def spy(cmd, **kw):
            captured["cmd"] = cmd
            return real_popen(cmd, **kw)

        monkeypatch.setattr(stub_bins.subprocess, "Popen", spy)
        out = str(tmp_path / "enc2.mp4")
        w = stub_bins.FFmpegWriter(out, 64, 48, 30.0, "yuv420p", "h264",
                                   audio_from="src.mp4")
        w.write_planes([np.zeros((48, 64, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8),
                        np.zeros((24, 32, 1), np.uint8)])
        w.close()
        cmd = captured["cmd"]
        assert cmd[cmd.index("-c:a") + 1] == "copy"


class TestAsyncWriter:
    """renderer._AsyncWriter must surface worker errors without deadlocking
    the producer on the bounded queue."""

    class _FailingWriter:
        def __init__(self, fail_after):
            self.fail_after = fail_after
            self.written = 0
            self.closed = False

        def write_planes(self, planes):
            import time
            time.sleep(0.005)
            if self.written >= self.fail_after:
                raise BrokenPipeError("encoder died")
            self.written += 1

        def close(self):
            self.closed = True

    def test_error_surfaces_not_deadlocks(self):
        from gyroflow_tpu.render.renderer import _AsyncWriter
        w = _AsyncWriter(self._FailingWriter(fail_after=2), depth=2)
        with pytest.raises(BrokenPipeError):
            # many more writes than queue depth: without the post-error
            # drain the producer would block forever in Queue.put
            for _ in range(50):
                w.write_planes([np.zeros((4, 4, 1), np.uint8)])
        # close() after a surfaced error must not hang (it may re-raise if
        # later queued writes also failed)
        try:
            w.close()
        except BrokenPipeError:
            pass

    def test_error_on_close_when_tail_write_fails(self):
        from gyroflow_tpu.render.renderer import _AsyncWriter
        inner = self._FailingWriter(fail_after=3)
        w = _AsyncWriter(inner, depth=8)
        for _ in range(4):          # all fit in the queue; last one fails
            w.write_planes([np.zeros((4, 4, 1), np.uint8)])
        with pytest.raises(BrokenPipeError):
            w.close()
        assert inner.closed


class TestCodecProfiles:
    """ProRes/DNxHR profile selection via codec_options
    (render_queue.rs:70,95-99; rendering/mod.rs:283-303)."""

    def test_prores_and_dnx_profiles(self):
        from gyroflow_tpu.render.ffmpeg_io import _encoder_args
        a = _encoder_args("prores", "yuv422p10le", 0.0, codec_options="HQ")
        assert a[a.index("-profile:v") + 1] == "3"
        a = _encoder_args("prores", "yuv422p10le", 0.0, codec_options="4444XQ")
        assert a[a.index("-profile:v") + 1] == "5"
        assert "yuva444p10le" in a
        a = _encoder_args("dnxhd", "yuv422p10le", 0.0,
                          codec_options="DNxHR HQX")
        assert a[a.index("-profile:v") + 1] == "dnxhr_hqx"
        a = _encoder_args("dnxhd", "yuv420p", 0.0)
        assert a[a.index("-profile:v") + 1] == "dnxhr_hq"

    def test_output_settings_pass_codec_options(self):
        from gyroflow_tpu.render.renderer import (RenderOptions,
                                                  apply_output_settings)
        o = apply_output_settings(RenderOptions(),
                                  {"codec": "ProRes", "codec_options": "LT"})
        assert o.codec == "prores" and o.codec_options == "LT"

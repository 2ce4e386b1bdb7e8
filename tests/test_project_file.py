"""Project file round trip + codec tests."""
import json
import zlib

import numpy as np
import pytest

from gyroflow_tpu.core.keyframes import KeyframeType
from gyroflow_tpu.core.project_file import (GyroflowProjectType, export_gyroflow_data,
                                            import_gyroflow_data)
from gyroflow_tpu.utils import base91, cbor
from gyroflow_tpu.utils.compression import (compress_to_base91_cbor,
                                            decompress_from_base91_cbor)

from test_manager_zoom import manager  # noqa: F401  (fixture)
from test_end_to_end import gcsv_path  # noqa: F401


class TestBase91:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        for n in (0, 1, 2, 13, 64, 1000):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            assert base91.decode(base91.encode(data)) == data

    def test_known_value(self):
        # basE91 of "test" per the reference alphabet
        assert base91.decode(base91.encode(b"test")) == b"test"
        assert base91.encode(b"") == ""


class TestCbor:
    def test_roundtrip_types(self):
        vals = [0, 1, 23, 24, 255, 65536, -1, -100, 1.5, "text", b"bytes",
                [1, 2, [3]], {"a": 1, "b": [True, False, None]},
                {1000: [0.1, 0.2, 0.3, 0.4]}]
        for v in vals:
            assert cbor.loads(cbor.dumps(v)) == v

    def test_blob_roundtrip(self):
        obj = {"quats": {1000 * i: [0.1 * i, 0.2, 0.3, 0.4] for i in range(100)}}
        blob = compress_to_base91_cbor(obj)
        assert isinstance(blob, str)
        assert decompress_from_base91_cbor(blob) == obj


class TestProjectRoundTrip:
    def test_roundtrip(self, manager):  # noqa: F811
        manager.smoothing.current.set_parameter("smoothness", 0.77)
        manager.smoothing.horizon_lock.set_horizon(80.0, 3.5)
        manager.keyframes.set(KeyframeType.Fov, 500_000, 1.25)
        manager.gyro.set_offset(100_000, 12.5)
        manager.params.trim_ranges = [(0.1, 0.8)]

        data = export_gyroflow_data(manager, GyroflowProjectType.WithGyroData)
        obj = json.loads(data)
        assert obj["version"] == 4
        assert obj["title"] == "Gyroflow data file"
        assert obj["stabilization"]["method"] == "Default"

        from gyroflow_tpu.core.manager import StabilizationManager
        m2 = StabilizationManager()
        import_gyroflow_data(m2, data, blocking=False)

        assert m2.params.size == manager.params.size
        assert m2.params.fps == manager.params.fps
        assert m2.smoothing.current.get_parameter("smoothness") == 0.77
        assert m2.smoothing.horizon_lock.horizonlockpercent == 80.0
        assert m2.smoothing.horizon_lock.horizonroll == 3.5
        assert m2.gyro.get_offsets() == {100_000: 12.5}
        assert m2.keyframes.is_keyframed(KeyframeType.Fov)
        assert abs(m2.params.trim_ranges[0][1] - 0.8) < 1e-9
        # embedded telemetry restored and re-integrated
        assert len(m2.gyro.file_metadata.raw_imu) == len(manager.gyro.file_metadata.raw_imu)
        assert len(m2.gyro.quaternions) > 0
        # lens profile restored
        assert m2.lens.fisheye_params.distortion_coeffs == \
            manager.lens.fisheye_params.distortion_coeffs

        # cleanup fixture state
        manager.gyro.clear_offsets()
        manager.params.trim_ranges = []
        manager.keyframes.clear_type(KeyframeType.Fov)
        manager.invalidate()
        manager.recompute_blocking()

    def test_processed_data_blobs(self, manager):  # noqa: F811
        data = export_gyroflow_data(manager, GyroflowProjectType.WithProcessedData)
        obj = json.loads(data)
        gs = obj["gyro_source"]
        for key in ("integrated_quaternions", "smoothed_quaternions", "adaptive_zoom_fovs"):
            assert isinstance(gs[key], str) and len(gs[key]) > 10
        fovs = decompress_from_base91_cbor(gs["adaptive_zoom_fovs"])
        assert len(fovs) == manager.params.frame_count

    def test_focal_length_blobs_roundtrip(self, manager):  # noqa: F811
        manager.params.focal_lengths = [24.0, None, 24.5, 25.0]
        manager.params.smoothed_focal_lengths = [24.0, 24.2, 24.5, 25.0]
        data = export_gyroflow_data(manager, GyroflowProjectType.WithProcessedData)
        gs = json.loads(data)["gyro_source"]
        assert isinstance(gs["focal_lengths"], str)
        from gyroflow_tpu.core.manager import StabilizationManager
        m2 = StabilizationManager()
        m2.init_from_video_data(manager.params.duration_ms, manager.params.fps,
                                manager.params.frame_count, manager.params.size)
        import_gyroflow_data(m2, data, blocking=False)
        assert m2.params.focal_lengths == [24.0, None, 24.5, 25.0]
        assert m2.params.smoothed_focal_lengths == [24.0, 24.2, 24.5, 25.0]

    def test_output_object_sets_size(self, manager):  # noqa: F811
        data = export_gyroflow_data(manager, additional_data={
            "output": {"output_width": 1280, "output_height": 720}})
        from gyroflow_tpu.core.manager import StabilizationManager
        m2 = StabilizationManager()
        m2.init_from_video_data(manager.params.duration_ms, manager.params.fps,
                                manager.params.frame_count, manager.params.size)
        import_gyroflow_data(m2, data, blocking=False)
        assert m2.params.output_size == (1280, 720)

    def test_reject_non_project(self, manager):  # noqa: F811
        with pytest.raises(ValueError):
            import_gyroflow_data(manager, json.dumps({"title": "nope"}))


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])

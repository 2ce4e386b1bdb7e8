"""ST-map export semantics (stmap.rs): expanded canvas, suppressed rotation,
static zoom, reference naming."""
import json
import os

import numpy as np

from test_end_to_end import gcsv_path, DUR_S  # noqa: F401

from gyroflow_tpu.core.manager import StabilizationManager
from gyroflow_tpu.utils.exr import read_exr
from gyroflow_tpu.utils.stmap import (compute_undistort_stmap, export_stmaps,
                                      stmap_filename_base)

VW, VH, FPS = 128, 96, 30.0

FISHEYE_LENS = {
    "camera_brand": "TestBrand", "camera_model": "Cam X1",
    "lens_model": "wide", "calib_dimension": {"w": VW, "h": VH},
    "fisheye_params": {
        "camera_matrix": [[VW * 0.62, 0, VW / 2], [0, VW * 0.62, VH / 2], [0, 0, 1]],
        "distortion_coeffs": [0.25, -0.07, 0.02, -0.003],
    },
    "sync_settings": {}, "calibrator_version": "1",
}


def make_manager(gcsv):
    mgr = StabilizationManager()
    mgr.init_from_video_data(DUR_S * 1000.0, FPS, int(DUR_S * FPS), (VW, VH))
    mgr.input_file = "/clips/My Clip.mp4"
    mgr.load_lens_profile(json.dumps(FISHEYE_LENS))
    mgr.load_gyro_data(gcsv)
    mgr.recompute_blocking()
    return mgr


def test_expanded_canvas_grows_with_distortion(gcsv_path):  # noqa: F811
    mgr = make_manager(gcsv_path)
    m = compute_undistort_stmap(mgr, 100.0, per_frame=False)
    # fisheye undistortion spills outside the frame -> canvas must expand
    assert m.shape[0] > VH and m.shape[1] > VW, m.shape
    assert np.isfinite(m).all()


def test_rotation_suppressed_maps_are_time_invariant(gcsv_path):  # noqa: F811
    """Single-frame export zeroes readout and suppresses rotation, so the
    map cannot depend on the (moving) gyro path (stmap.rs:24-38)."""
    mgr = make_manager(gcsv_path)
    m1 = compute_undistort_stmap(mgr, 100.0, per_frame=False)
    m2 = compute_undistort_stmap(mgr, 900.0, per_frame=False)
    np.testing.assert_array_equal(m1, m2)


def test_filename_includes_lens_identity(gcsv_path):  # noqa: F811
    mgr = make_manager(gcsv_path)
    base = stmap_filename_base(mgr)
    assert base == "My-Clip-TestBrand-Cam-X1-wide"


def test_export_writes_expanded_exr(gcsv_path, tmp_path):  # noqa: F811
    mgr = make_manager(gcsv_path)
    export_stmaps(mgr, str(tmp_path), single_frame=True)
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 2
    und = [f for f in files if "undistort" in f][0]
    ch = read_exr(str(tmp_path / und))
    assert set(ch) == {"R", "G", "B"}
    assert ch["R"].shape[0] > VH and ch["R"].shape[1] > VW
    red = [f for f in files if "redistort" in f][0]
    ch2 = read_exr(str(tmp_path / red))
    assert ch2["R"].shape == (VH, VW)

"""Deferred-overflow contract of process_pixels (round 4).

The production render path dispatches without a per-plane device sync:
process_pixels(defer_overflow=True) returns the overflow flag as a device
scalar in info["overflow"] instead of blocking on it (a blocking bool(ov)
per plane serializes dispatch with execution — measured 61 of 68 ms/frame
of the production path through a remote-device tunnel). The caller checks
the flag when the frame is consumed and replays through the blocking path
(which re-probes the window ladder) on the rare stale-window hit.

Also covers the fused in-graph output cast (out_dtype): uint16 planes come
back uint16 from the SAME dispatch, matching the old two-dispatch
to_uint16_jit path bit-for-bit.
"""
import numpy as np
import pytest

from gyroflow_tpu.core.manager import StabilizationManager

from test_end_to_end import gcsv_path, DUR_S, W, H  # noqa: F401 (fixture)
from test_invalidation import mgr  # noqa: F401 (fixture)


def _plane(dtype=np.float32, maxv=255):
    rng = np.random.default_rng(7)
    img = rng.uniform(0, maxv, (H, W, 1))
    return np.clip(img, 0, maxv).astype(dtype)


def test_deferred_matches_blocking(mgr):  # noqa: F811
    img = _plane()
    out_b, info_b = mgr.process_pixels(500_000, img, use_pallas=True)
    out_d, info_d = mgr.process_pixels(500_000, img, use_pallas=True,
                                       defer_overflow=True)
    assert "overflow" in info_d and "overflow" not in info_b
    fl = info_d["overflow"]
    assert fl is not None and not bool(fl)
    assert np.array_equal(np.asarray(out_b), np.asarray(out_d))


def test_deferred_flag_none_on_ladder_walk(mgr):  # noqa: F811
    """First call per config walks the ladder (blocking probe) — the flag is
    None because the window it cached was just verified."""
    img = _plane()
    out, info = mgr.process_pixels(400_000, img, use_pallas=True,
                                   defer_overflow=True)
    assert info["overflow"] is None
    # second call uses the cache -> device flag returned
    out, info = mgr.process_pixels(400_000, img, use_pallas=True,
                                   defer_overflow=True)
    assert info["overflow"] is not None


def test_deferred_replay_on_stale_window(mgr):  # noqa: F811
    """A cached window that no longer covers the geometry raises the flag;
    replaying through the blocking path re-probes and returns correct
    pixels."""
    img = _plane()
    # fresh blocking render = ground truth (probes + caches a valid window)
    truth, _ = mgr.process_pixels(500_000, img, use_pallas=True)
    truth = np.asarray(truth)
    # poison the cache with a window too narrow for the source span:
    # tile_w == win_w leaves no room for the 8-tap footprint
    assert len(mgr._win_cache) == 1
    wkey = next(iter(mgr._win_cache))
    good_win = mgr._win_cache[wkey]
    mgr._win_cache[wkey] = (24, 128, 0, 128, 16, 16)
    out, info = mgr.process_pixels(500_000, img, use_pallas=True,
                                   defer_overflow=True)
    fl = info["overflow"]
    assert fl is not None and bool(fl), "poisoned window must overflow"
    # replay contract: blocking call re-probes the ladder and recovers
    reprobes0 = mgr.stats["window_reprobes"]
    out2, _ = mgr.process_pixels(500_000, img, use_pallas=True)
    assert mgr.stats["window_reprobes"] == reprobes0 + 1
    assert mgr._win_cache[wkey] == good_win
    assert np.array_equal(np.asarray(out2), truth)


@pytest.mark.parametrize("dtype,maxv", [(np.uint8, 255.0), (np.uint16, 1023.0)])
def test_fused_output_cast(mgr, dtype, maxv):  # noqa: F811
    """Integer planes come back in their dtype from ONE dispatch, matching
    the reference semantics of the old second-dispatch cast."""
    img = _plane(dtype, int(maxv))
    out, _ = mgr.process_pixels(500_000, img, use_pallas=True,
                                max_pixel_value=maxv)
    out = np.asarray(out)
    assert out.dtype == dtype
    # f32 ground truth -> same rint/clip cast on host
    f32, _ = mgr.process_pixels(500_000, img.astype(np.float32),
                                use_pallas=True, max_pixel_value=maxv)
    f32 = np.asarray(f32)
    if dtype == np.uint8:
        expect = np.clip(f32, 0, 255).astype(np.uint8)
    else:
        expect = np.clip(np.rint(f32), 0, maxv).astype(np.uint16)
    assert np.array_equal(out, expect)


def test_mats_device_cache_bounded_and_shared(mgr):  # noqa: F811
    """Y and UV planes of one frame share ONE uploaded matrix stack; the
    cache stays bounded over long timestamp walks."""
    img = _plane()
    uv = _plane()[: H // 2, : W // 2].repeat(2, axis=2)
    mgr.process_pixels(500_000, img, use_pallas=False, plane_index=0,
                       plane_rects=True)
    n0 = len(mgr._mats_dev)
    mgr.process_pixels(500_000, uv, use_pallas=False, plane_index=1,
                       plane_rects=True)
    assert len(mgr._mats_dev) == n0        # same ts -> no second upload
    for i in range(80):
        mgr.process_pixels(500_000 + i * 33_366, img, use_pallas=False)
    assert len(mgr._mats_dev) <= 64
    assert len(mgr._stab_cache) <= 256

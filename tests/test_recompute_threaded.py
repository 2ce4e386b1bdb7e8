"""recompute_threaded: background recompute + compute-id cancellation
(lib.rs:636-791)."""
import threading
import time

from test_end_to_end import gcsv_path, DUR_S  # noqa: F401

from gyroflow_tpu.core.manager import StabilizationManager


def make_manager(gcsv, frames=60):
    mgr = StabilizationManager()
    mgr.init_from_video_data(DUR_S * 1000.0, frames / DUR_S, frames, (256, 192))
    mgr.load_gyro_data(gcsv)
    return mgr


def test_threaded_recompute_completes_and_calls_back(gcsv_path):  # noqa: F811
    mgr = make_manager(gcsv_path)
    done = threading.Event()
    got = []

    def cb(cid):
        got.append(cid)
        done.set()

    cid = mgr.recompute_threaded(cb)
    assert done.wait(timeout=120), "recompute did not finish"
    assert got == [cid]
    assert mgr.current_compute_id == cid
    assert mgr.params.fovs, "fovs not computed"


def test_cancelled_recompute_discards_result(gcsv_path):  # noqa: F811
    mgr = make_manager(gcsv_path)
    stale_cb = []

    # slow down stage 1 so the invalidation lands mid-flight deterministically
    orig = mgr.recompute_smoothness
    entered = threading.Event()
    release = threading.Event()

    def slow_smoothness():
        entered.set()
        release.wait(timeout=60)
        orig()

    mgr.recompute_smoothness = slow_smoothness
    stale_id = mgr.recompute_threaded(lambda cid: stale_cb.append(cid))
    assert entered.wait(timeout=60)
    mgr.invalidate()               # supersedes the in-flight compute
    release.set()
    mgr._recompute_thread.join(timeout=120)
    assert stale_cb == [], "cancelled compute must not call back"
    assert mgr.current_compute_id != stale_id

    # a fresh recompute still works after the cancellation
    mgr.recompute_smoothness = orig
    done = threading.Event()
    cid2 = mgr.recompute_threaded(lambda cid: done.set())
    assert done.wait(timeout=120)
    assert mgr.current_compute_id == cid2

"""Multi-chip frame-window rendering in the PRODUCTION path (VERDICT r2 #1).

Runs on the 8-virtual-device CPU mesh (conftest.py). Validates that
render/renderer.py's windowed mode — decode -> frame window ->
stabilize_window_production under jax.shard_map -> encode — produces the
same output as the per-frame single-device path, through the real
RenderQueue, with the overflow retry ladder live. Reference semantics:
render_queue.rs:677 (parallel renders), BASELINE.json configs[4].
"""
import os

import jax
import numpy as np
import pytest

from test_end_to_end import gcsv_path, DUR_S  # noqa: F401

W, H, FPS, FRAMES = 64, 48, 30.0, 10


def write_y4m(path, frames, fps=FPS):
    """frames: list of (y, u, v) uint8 planes."""
    from gyroflow_tpu.render.y4m_io import Y4MWriter
    w = Y4MWriter(path, frames[0][0].shape[1], frames[0][0].shape[0], fps,
                  "yuv420p")
    for y, u, v in frames:
        w.write_planes([y[..., None], u[..., None], v[..., None]])
    w.close()


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    rng = np.random.default_rng(7)
    base_y = rng.uniform(16, 235, (H * 2, W * 2)).astype(np.uint8)
    base_u = rng.uniform(16, 240, (H, W)).astype(np.uint8)
    base_v = rng.uniform(16, 240, (H, W)).astype(np.uint8)
    frames = []
    for i in range(FRAMES):
        oy = H // 2 + int(8 * np.sin(i / 3.0))
        ox = W // 2 + int(8 * np.cos(i / 4.0))
        y = base_y[oy:oy + H, ox:ox + W]
        u = base_u[oy // 2:oy // 2 + H // 2, ox // 2:ox // 2 + W // 2]
        v = base_v[oy // 2:oy // 2 + H // 2, ox // 2:ox // 2 + W // 2]
        frames.append((y, u, v))
    p = str(tmp_path_factory.mktemp("clip") / "in.y4m")
    write_y4m(p, frames)
    return p


def make_mgr(gcsv, frames=FRAMES, size=(W, H)):
    from gyroflow_tpu.core.manager import StabilizationManager
    m = StabilizationManager()
    m.init_from_video_data(frames / FPS * 1000.0, FPS, frames, size)
    m.load_gyro_data(gcsv)
    m.recompute_blocking()
    return m


def read_y4m_planes(path):
    from gyroflow_tpu.render.y4m_io import Y4MReader
    r = Y4MReader(path)
    out = [[p.copy() for p in planes] for _, planes in r]
    r.close()
    return out


class TestWindowedRender:
    def _render(self, mgr, clip, out, **opt_kw):
        from gyroflow_tpu.render.renderer import RenderOptions, render
        opts = RenderOptions(interpolation=2, **opt_kw)
        return render(mgr, clip, out, opts)

    def test_windowed_matches_single_device(self, clip_path, gcsv_path,  # noqa: F811
                                            tmp_path):
        mgr = make_mgr(gcsv_path)
        s1 = self._render(mgr.get_cloned(), clip_path,
                          str(tmp_path / "single.y4m"), frame_window=1)
        s2 = self._render(mgr.get_cloned(), clip_path,
                          str(tmp_path / "sharded.y4m"),
                          frame_window=4, shard_sp=2)
        assert s1["frames"] == s2["frames"] == FRAMES
        assert s2["backend"].endswith("-sharded")
        assert s2["mesh"] == {"dp": 4, "sp": 2}
        assert s2["frame_window"] == 4
        a = read_y4m_planes(str(tmp_path / "single.y4m"))
        b = read_y4m_planes(str(tmp_path / "sharded.y4m"))
        assert len(a) == len(b) == FRAMES
        for fa, fb in zip(a, b):
            for pa, pb in zip(fa, fb):
                # same math (XLA remap on CPU); integer codes may differ by
                # 1 where float rounding crosses a .5 boundary
                np.testing.assert_allclose(pb.astype(np.int32),
                                           pa.astype(np.int32), atol=1)

    def test_single_device_explicit_window(self, clip_path, gcsv_path,  # noqa: F811
                                           tmp_path, monkeypatch):
        """An explicit frame_window batches frames per dispatch even on one
        device (dp=1, f_local=F) and matches the per-frame render."""
        import jax
        import gyroflow_tpu.render.renderer as rmod
        one = jax.devices()[:1]
        monkeypatch.setattr(jax, "devices", lambda *a: one)
        mgr = make_mgr(gcsv_path)
        s1 = self._render(mgr.get_cloned(), clip_path,
                          str(tmp_path / "pf.y4m"), frame_window=1)
        s2 = self._render(mgr.get_cloned(), clip_path,
                          str(tmp_path / "w4.y4m"), frame_window=4)
        assert s2["backend"].endswith("-sharded")
        assert s2["mesh"] == {"dp": 1, "sp": 1}
        a = read_y4m_planes(str(tmp_path / "pf.y4m"))
        b = read_y4m_planes(str(tmp_path / "w4.y4m"))
        for fa, fb in zip(a, b):
            for pa, pb in zip(fa, fb):
                np.testing.assert_allclose(pb.astype(np.int32),
                                           pa.astype(np.int32), atol=1)

    def test_partial_tail_window_pads(self, clip_path, gcsv_path, tmp_path):  # noqa: F811
        # 10 frames, window 8 -> one full window + a 2-frame padded tail
        mgr = make_mgr(gcsv_path)
        s = self._render(mgr, clip_path, str(tmp_path / "tail.y4m"),
                         frame_window=8, shard_sp=1)
        assert s["frames"] == FRAMES
        assert len(read_y4m_planes(str(tmp_path / "tail.y4m"))) == FRAMES

    def test_through_render_queue(self, clip_path, gcsv_path, tmp_path):  # noqa: F811
        from gyroflow_tpu.render.render_queue import JobStatus, RenderQueue
        from gyroflow_tpu.render.renderer import RenderOptions
        mgr = make_mgr(gcsv_path)
        q = RenderQueue(parallel_renders=1)
        opts = RenderOptions(interpolation=2, frame_window=4, shard_sp=2)
        out = str(tmp_path / "queued.y4m")
        q.add_job(mgr, clip_path, out, opts)
        q.run(overwrite=True)
        assert all(j.status == JobStatus.Finished for j in q.jobs.values()), \
            {j.job_id: (j.status, j.error) for j in q.jobs.values()}
        assert len(read_y4m_planes(out)) == FRAMES


class Test8KQueueJob:
    def test_8k_shaped_job_through_queue(self, gcsv_path, tmp_path):  # noqa: F811
        """VERDICT r2 #1/#8: an 8K-shaped job (8192-wide planes) passes
        through the RenderQueue with frame-window sharding."""
        from gyroflow_tpu.render.render_queue import JobStatus, RenderQueue
        from gyroflow_tpu.render.renderer import RenderOptions
        W8, H8, N = 8192, 2176, 2
        rng = np.random.default_rng(11)
        frames = []
        for _ in range(N):
            frames.append((rng.integers(16, 235, (H8, W8)).astype(np.uint8),
                           rng.integers(16, 240, (H8 // 2, W8 // 2)).astype(np.uint8),
                           rng.integers(16, 240, (H8 // 2, W8 // 2)).astype(np.uint8)))
        clip = str(tmp_path / "in8k.y4m")
        write_y4m(clip, frames, fps=FPS)
        mgr = make_mgr(gcsv_path, frames=N, size=(W8, H8))
        q = RenderQueue(parallel_renders=1)
        out = str(tmp_path / "out8k.y4m")
        q.add_job(mgr, clip, out,
                  RenderOptions(interpolation=2, frame_window=2, shard_sp=1))
        q.run(overwrite=True)
        assert all(j.status == JobStatus.Finished for j in q.jobs.values()), \
            {j.job_id: (j.status, j.error) for j in q.jobs.values()}
        rendered = read_y4m_planes(out)
        assert len(rendered) == N
        assert rendered[0][0].shape[:2] == (H8, W8)


class TestWindowedPallasParity:
    def test_window_pallas_matches_per_frame(self, gcsv_path):  # noqa: F811
        """Sharded Pallas (interpret) == single-device Pallas, via the
        manager's production entry points."""
        from gyroflow_tpu.parallel.pipeline import make_frame_mesh
        mgr = make_mgr(gcsv_path)
        rng = np.random.default_rng(3)
        frames = rng.uniform(0, 255, (4, H, W, 1)).astype(np.uint8)
        ts = [int(i / FPS * 1e6) for i in range(4)]
        mesh = make_frame_mesh(8, sp=2)
        out, info = mgr.process_pixels_window(
            ts, frames, mesh, interpolation=2, use_pallas=True)
        assert info["backend"] == "pallas-tpu-sharded"
        out = np.asarray(out)
        for i in range(4):
            ref, _ = mgr.process_pixels(ts[i], frames[i], interpolation=2,
                                        use_pallas=True)
            np.testing.assert_allclose(
                out[i].astype(np.int32), np.asarray(ref).astype(np.int32),
                atol=1)

    def test_window_with_sony_mesh_matches_per_frame(self, tmp_path_factory):
        """with_mesh branch: per-frame Sony mesh/FPD blobs ride the sharded
        window (dp-sharded operand) and match the per-frame path."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from test_sony_canon import make_tagmap, FPS as SFPS, W as SW, H as SH
        from gyroflow_tpu.core.telemetry import sony
        from gyroflow_tpu.core.manager import StabilizationManager
        from gyroflow_tpu.parallel.pipeline import make_frame_mesh

        p = str(tmp_path_factory.mktemp("sonyw") / "s.mp4")
        open(p, "wb").write(sony.build_tagmap_mp4(
            [make_tagmap(i) for i in range(8)], SFPS))
        mgr = StabilizationManager()
        mgr.init_from_video_data(8 / SFPS * 1000.0, SFPS, 8, (SW, SH))
        mgr.load_gyro_data(p)
        mgr.recompute_blocking()
        # confirm the mesh actually flows
        ft = mgr.frame_transform_at(2 * 1000.0 / SFPS)
        assert ft.mesh_data is not None

        rng = np.random.default_rng(9)
        frames = rng.uniform(0, 255, (4, SH, SW, 1)).astype(np.float32)
        ts = [int(i / SFPS * 1e6) for i in range(4)]
        mesh = make_frame_mesh(4, sp=1)
        out, info = mgr.process_pixels_window(ts, frames, mesh,
                                              interpolation=2,
                                              use_pallas=True)
        out = np.asarray(out)
        for i in range(4):
            ref, _ = mgr.process_pixels(ts[i], frames[i], interpolation=2,
                                        use_pallas=True)
            np.testing.assert_allclose(out[i], np.asarray(ref), atol=1e-3)

    def test_heterogeneous_window_falls_back_per_frame(self, tmp_path_factory):
        """Mesh data present for only part of the window (flags differ across
        frames): the windowed entry point must process frame-by-frame instead
        of aborting the render."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from test_sony_canon import make_tagmap, FPS as SFPS, W as SW, H as SH
        from gyroflow_tpu.core.telemetry import sony
        from gyroflow_tpu.core.manager import StabilizationManager
        from gyroflow_tpu.parallel.pipeline import make_frame_mesh

        p = str(tmp_path_factory.mktemp("sonyh") / "s.mp4")
        open(p, "wb").write(sony.build_tagmap_mp4(
            [make_tagmap(i) for i in range(8)], SFPS))
        mgr = StabilizationManager()
        mgr.init_from_video_data(8 / SFPS * 1000.0, SFPS, 8, (SW, SH))
        mgr.load_gyro_data(p)
        # frames 2+ lose their mesh blobs -> HAS_MESH_DATA flag varies
        del mgr.gyro.file_metadata.mesh_correction[2:]
        mgr.recompute_blocking()
        assert mgr.frame_transform_at(0.0).mesh_data is not None
        assert mgr.frame_transform_at(3 * 1000.0 / SFPS).mesh_data is None

        rng = np.random.default_rng(11)
        frames = rng.uniform(0, 255, (4, SH, SW, 1)).astype(np.float32)
        ts = [int(i / SFPS * 1e6) for i in range(4)]
        mesh = make_frame_mesh(4, sp=1)
        out, info = mgr.process_pixels_window(ts, frames, mesh,
                                              interpolation=2,
                                              use_pallas=True)
        assert info["backend"].endswith("+per-frame")
        out = np.asarray(out)
        for i in range(4):
            ref, _ = mgr.process_pixels(ts[i], frames[i], interpolation=2,
                                        use_pallas=True)
            np.testing.assert_allclose(out[i], np.asarray(ref), atol=1e-3)

    def test_overflow_ladder_climbs(self, gcsv_path):  # noqa: F811
        """A strong zoom-out forces small windows to overflow; the ladder
        must climb to a bigger window instead of shipping corrupt tiles."""
        mgr = make_mgr(gcsv_path)
        mgr.params.fov = 2.5           # zoom far out -> wide source bboxes
        mgr.recompute_blocking()
        from gyroflow_tpu.parallel.pipeline import make_frame_mesh
        rng = np.random.default_rng(5)
        frames = rng.uniform(0, 255, (2, H, W, 1)).astype(np.uint8)
        ts = [0, int(1 / FPS * 1e6)]
        mesh = make_frame_mesh(2, sp=1)
        out, info = mgr.process_pixels_window(
            ts, frames, mesh, interpolation=2, use_pallas=True)
        assert info["backend"] in ("pallas-tpu-sharded", "xla-sharded")
        for i in range(2):
            ref, _ = mgr.process_pixels(ts[i], frames[i], interpolation=2,
                                        use_pallas=True)
            np.testing.assert_allclose(
                np.asarray(out)[i].astype(np.int32),
                np.asarray(ref).astype(np.int32), atol=1)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestShardedTrimRanges:
    """Trim ranges + pad_with_black through the WINDOWED sharded path must
    match the per-frame single-device render frame-for-frame."""

    def test_multi_range_windowed_matches_serial(self, clip_path, gcsv_path,
                                                 tmp_path):  # noqa: F811
        from gyroflow_tpu.render.renderer import RenderOptions, render
        mgr = make_mgr(gcsv_path)
        mgr.params.trim_ranges = [(0.0, 0.3), (0.6, 0.9)]

        serial = str(tmp_path / "serial.y4m")
        render(mgr, clip_path, serial,
               RenderOptions(interpolation=2, frame_window=1))
        sharded = str(tmp_path / "sharded.y4m")
        stats = render(mgr, clip_path, sharded,
                       RenderOptions(interpolation=2, frame_window=4,
                                     shard_sp=2))
        assert "sharded" in stats["backend"], stats
        a = read_y4m_planes(serial)
        b = read_y4m_planes(sharded)
        assert len(a) == len(b) and len(a) > 0
        for fa, fb in zip(a, b):
            for pa, pb in zip(fa, fb):
                np.testing.assert_array_equal(pa, pb)

    def test_pad_with_black_windowed_matches_serial(self, clip_path, gcsv_path,
                                                    tmp_path):  # noqa: F811
        from gyroflow_tpu.render.renderer import RenderOptions, render
        mgr = make_mgr(gcsv_path)
        mgr.params.trim_ranges = [(0.0, 0.3), (0.6, 0.9)]

        serial = str(tmp_path / "pserial.y4m")
        render(mgr, clip_path, serial,
               RenderOptions(interpolation=2, frame_window=1,
                             pad_with_black=True))
        sharded = str(tmp_path / "psharded.y4m")
        render(mgr, clip_path, sharded,
               RenderOptions(interpolation=2, frame_window=4, shard_sp=2,
                             pad_with_black=True))
        a = read_y4m_planes(serial)
        b = read_y4m_planes(sharded)
        assert len(a) == len(b) == FRAMES
        for fa, fb in zip(a, b):
            for pa, pb in zip(fa, fb):
                np.testing.assert_array_equal(pa, pb)

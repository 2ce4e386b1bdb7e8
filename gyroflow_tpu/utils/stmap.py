"""ST-map export (undistort/distort UV maps for compositing tools).

Port of /root/reference/src/core/stmap.rs: evaluate the remap's uv field over
the output grid, write as 32-bit float EXR (via OpenCV's OpenEXR writer).
"""
from __future__ import annotations

import logging
import os

import numpy as np

log = logging.getLogger(__name__)

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


def compute_undistort_stmap(mgr, timestamp_ms: float) -> np.ndarray:
    """(OH, OW, 3) f32: RG = normalized source uv per output pixel, B = 0.

    Mirrors stmap.rs:40-121 using the same undistort_coord math."""
    import jax.numpy as jnp
    from ..ops import remap

    ft = mgr.frame_transform_at(timestamp_ms)
    cfg = ft.kernel_cfg
    dyn = ft.kernel_dyn
    oh, ow = cfg.output_height, cfg.output_width

    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    out_pos = jnp.stack([gx, gy], axis=-1)
    factor = jnp.maximum(1.0 - dyn.lens_correction_amount, 0.001)
    out_f = (dyn.f[0] / dyn.fov / factor, dyn.f[1] / dyn.fov / factor)
    uv, valid = remap.undistort_coord(out_pos, jnp.asarray(ft.matrices), cfg, dyn,
                                      (ow / 2.0, oh / 2.0), out_f)
    uv = np.asarray(uv)
    valid = np.asarray(valid)
    out = np.zeros((oh, ow, 3), np.float32)
    out[..., 0] = uv[..., 0] / cfg.width
    # ST maps are bottom-up: v flipped (compositing convention, stmap.rs)
    out[..., 1] = 1.0 - uv[..., 1] / cfg.height
    out[..., 0] = np.where(valid, out[..., 0], -1.0)
    out[..., 1] = np.where(valid, out[..., 1], -1.0)
    return out


def write_stmap(path: str, stmap: np.ndarray):
    if path.lower().endswith(".exr"):
        from .exr import write_exr
        write_exr(path, {"R": stmap[..., 0], "G": stmap[..., 1], "B": stmap[..., 2]})
    elif path.lower().endswith(".png"):
        import cv2
        png16 = np.clip(stmap * 65535.0, 0, 65535).astype(np.uint16)
        cv2.imwrite(path, png16[:, :, ::-1])
    else:
        np.save(path, stmap)


def compute_redistort_stmap(mgr, timestamp_ms: float) -> np.ndarray:
    """(H, W, 3) f32: the inverse map — per INPUT pixel, its stabilized
    output position (stmap.rs:115-119 `dist`, via undistort_points)."""
    from ..ops.undistort_points import undistort_points_with_rolling_shutter

    cp = mgr.get_compute_params()
    cfg = mgr.frame_transform_at(timestamp_ms).kernel_cfg
    h, w = cfg.height, cfg.width
    fps = mgr.params.get_scaled_fps() or 30.0
    frame = int(round(timestamp_ms * fps / 1000.0))
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=-1)
    mapped = np.asarray(undistort_points_with_rolling_shutter(
        pts, timestamp_ms, frame, cp, 1.0, True)).reshape(h, w, 2)
    out = np.zeros((h, w, 3), np.float32)
    out[..., 0] = mapped[..., 0] / cfg.output_width
    out[..., 1] = 1.0 - mapped[..., 1] / cfg.output_height
    return out


def export_stmaps(mgr, folder: str, single_frame: bool = True,
                  frame: int = 0, ext: str = ".exr"):
    """CLI --export-stmap (cli.rs): per frame, the reference writes BOTH maps
    (render_queue.rs:993-999): `{base}-undistort-{N}` (output→source uv) and
    `{base}-redistort-{N}` (source→output uv)."""
    os.makedirs(folder, exist_ok=True)
    base = os.path.splitext(os.path.basename(mgr.input_file or "stmap"))[0]
    fps = mgr.params.get_scaled_fps() or 30.0
    frames = [frame] if single_frame else range(mgr.params.frame_count)
    for f in frames:
        ts = f * 1000.0 / fps
        und = compute_undistort_stmap(mgr, ts)
        write_stmap(os.path.join(folder, f"{base}-undistort-{f}{ext}"), und)
        red = compute_redistort_stmap(mgr, ts)
        write_stmap(os.path.join(folder, f"{base}-redistort-{f}{ext}"), red)

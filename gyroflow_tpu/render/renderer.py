"""Export render loop.

Port of the pipeline in /root/reference/src/rendering/mod.rs:187-679: trim
ranges, video-speed frame drop/duplicate rate control, per-frame stabilization,
encode, audio passthrough (structural MP4 remux via utils/mp4mux.py — no
ffmpeg binary needed).
"""
from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from .video_io import VideoReader, VideoWriter

log = logging.getLogger(__name__)


@dataclass
class RenderOptions:
    """Subset of rendering/render_queue RenderOptions."""
    codec: str = "mp4v"
    output_width: int = 0
    output_height: int = 0
    bitrate: float = 0.0
    use_gpu: bool = True
    audio: bool = False
    trim_start: float = 0.0     # fraction 0..1
    trim_end: float = 1.0
    interpolation: int = 8
    safe_area: Optional[list] = None   # [x0, y0, x1, y1] output px → dim outside
    overlay: object = None             # core.drawing.DrawCanvas debug overlay
    trace: bool = False                # per-stage timing summary (SURVEY §5)
    pipeline_depth: int = 3            # frames in flight on the device queue


def render(mgr, input_path: str, output_path: str,
           options: Optional[RenderOptions] = None,
           progress_cb: Optional[Callable[[float], None]] = None,
           cancel_flag: Optional[list] = None) -> dict:
    """Stabilize input video into output. Returns summary stats."""
    import jax

    options = options or RenderOptions()
    reader = VideoReader(input_path)
    ow = options.output_width or mgr.params.output_size[0] or reader.width
    oh = options.output_height or mgr.params.output_size[1] or reader.height
    if (ow, oh) != tuple(mgr.params.output_size):
        # keep the manager's remap target in sync with the writer — otherwise
        # stabilized frames keep the project size and the encoder would
        # silently drop every mismatched frame (render_queue.rs output size)
        mgr.set_output_size(ow, oh)
        mgr.recompute_blocking()
    writer = VideoWriter(output_path, ow, oh, reader.fps, options.codec)

    n = reader.frame_count or 1
    first = int(options.trim_start * n)
    last = int(options.trim_end * n)
    if first > 0:
        reader.seek_frame(first)

    use_pallas = jax.default_backend() not in ("cpu",)
    frames_done = 0
    video_speed = mgr.params.video_speed
    speed_acc = 0.0
    import time as _time
    t_decode = t_stab = t_encode = 0.0
    t_start = _time.time()
    inflight = []   # queued device results not yet transferred/encoded

    try:
        _t0 = _time.time()
        for ts_us, rgb in reader:
            t_decode += _time.time() - _t0
            idx = first + frames_done
            if idx > last:
                break
            if cancel_flag and cancel_flag[0]:
                break
            # video-speed rate control (rendering/mod.rs:460-479): drop or
            # duplicate frames so output duration scales by 1/speed
            emit = 1
            if video_speed != 1.0:
                speed_acc += 1.0 / video_speed
                emit = int(speed_acc)
                speed_acc -= emit
            if emit > 0:
                drawing = None
                if options.overlay is not None or options.safe_area is not None:
                    from ..core.drawing import DrawCanvas
                    canvas = options.overlay or DrawCanvas(
                        rgb.shape[1], rgb.shape[0], rgb.shape[1], rgb.shape[0])
                    rect = tuple(float(v) for v in options.safe_area) \
                        if options.safe_area else None
                    drawing = canvas.state(safe_area_rect=rect)
                _t1 = _time.time()
                out, info = mgr.process_pixels(ts_us, rgb,
                                               interpolation=options.interpolation,
                                               use_pallas=use_pallas,
                                               drawing=drawing)
                t_stab += _time.time() - _t1
                # depth-k dispatch pipeline: the device queue keeps computing
                # frame N+1..N+k while frame N transfers back and encodes
                # (rendering/mod.rs's decoder/encoder threading, TPU-style)
                inflight.append((out, emit))
                while len(inflight) > options.pipeline_depth:
                    o, e = inflight.pop(0)
                    _t2 = _time.time()
                    out_np = np.asarray(o)
                    _t3 = _time.time()
                    t_stab += _t3 - _t2
                    for _ in range(e):
                        writer.write_rgb(out_np)
                    t_encode += _time.time() - _t3
            frames_done += 1
            if progress_cb:
                progress_cb(min(frames_done / max(last - first + 1, 1), 1.0))
            _t0 = _time.time()
        while inflight:
            o, e = inflight.pop(0)
            out_np = np.asarray(o)
            for _ in range(e):
                writer.write_rgb(out_np)
    finally:
        reader.close()
        writer.close()

    audio_copied = False
    if options.audio and output_path.lower().endswith((".mp4", ".mov")) \
            and input_path.lower().endswith((".mp4", ".mov")):
        # passthrough remux (ffmpeg stream-copy equivalent, rendering/mod.rs:425)
        import os
        from ..utils.mp4mux import remux_with_audio
        tmp = output_path + ".remux.mp4"
        try:
            if remux_with_audio(output_path, input_path, tmp):
                os.replace(tmp, output_path)
                audio_copied = True
        except Exception as e:
            log.warning("audio passthrough failed, keeping video-only: %s", e)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    wall = _time.time() - t_start
    stats = {"frames": frames_done, "output": output_path, "audio": audio_copied,
             "backend": "pallas-tpu" if use_pallas else "xla",
             "fps": round(frames_done / wall, 2) if wall > 0 else 0.0}
    if options.trace:
        # per-stage timing summary (SURVEY §5: structured per-stage timing +
        # the frames/sec north-star counter)
        stats["trace"] = {"decode_s": round(t_decode, 3),
                          "stabilize_s": round(t_stab, 3),
                          "encode_s": round(t_encode, 3),
                          "wall_s": round(wall, 3)}
        log.info("trace: %d frames in %.2fs (%.2f fps) | decode %.2fs, "
                 "stabilize %.2fs (%.1f ms/frame), encode %.2fs",
                 frames_done, wall, stats["fps"], t_decode, t_stab,
                 t_stab / max(frames_done, 1) * 1000.0, t_encode)
    return stats

from .pipeline import stabilize_window, stabilize_window_sharded, make_frame_mesh

__all__ = ["stabilize_window", "stabilize_window_sharded", "make_frame_mesh"]

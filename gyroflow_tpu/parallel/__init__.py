from .pipeline import (make_frame_mesh, make_window_step, place_window,
                       stabilize_window, stabilize_window_production,
                       stabilize_window_sharded, stack_dynamics)

__all__ = ["stabilize_window", "stabilize_window_sharded", "make_frame_mesh",
           "make_window_step", "place_window", "stabilize_window_production",
           "stack_dynamics"]

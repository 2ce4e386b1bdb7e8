"""Frame-window batch pipeline + multi-chip sharding.

The reference parallelizes frames with rayon inside one process
(fov_iterative.rs:42, render_queue.rs:677). TPU-native: frames are the data-
parallel axis — a window of F frames is stabilized as one jitted program,
sharded across chips via jax.sharding.Mesh("dp") on the frame axis, with the
output-row axis optionally sharded over "sp" (rows are independent given the
replicated source frame). No collectives are needed inside the step (each
frame's transform depends only on precomputed smoothed quats — SURVEY.md §5).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import remap
from ..ops.kernel_params import KernelConfig, KernelDynamics


def stack_dynamics(dyns) -> KernelDynamics:
    """Stack per-frame KernelDynamics into one batched pytree (leading F axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *dyns)


@functools.partial(jax.jit, static_argnames=("cfg",))
def stabilize_window(imgs, matrices, cfg: KernelConfig, dyns: KernelDynamics):
    """Stabilize F frames: imgs (F,H,W,C), matrices (F,M,14), dyns batched.

    vmapped XLA remap — used for the sharded/multi-chip path and dryruns
    (the Pallas kernels drive the single-chip hot path in `bench.py`).
    """
    return jax.vmap(lambda i, m, d: remap.remap_plane(i, m, cfg, d))(imgs, matrices, dyns)


def make_frame_mesh(n_devices: Optional[int] = None, sp: int = 1) -> Mesh:
    """Mesh over ("dp", "sp"): frames x output-row blocks."""
    devs = jax.devices()
    n = n_devices or len(devs)
    dp = n // sp
    return Mesh(np.asarray(devs[:dp * sp]).reshape(dp, sp), ("dp", "sp"))


def stabilize_window_sharded(mesh: Mesh, imgs, matrices, cfg: KernelConfig,
                             dyns: KernelDynamics):
    """Frame-window DP across chips (+ optional row sharding on 'sp').

    Inputs are sharded: frames over 'dp'; source frames replicated over 'sp';
    the output is sharded (dp: frames, sp: rows). XLA inserts any needed
    resharding collectives over ICI.
    """
    in_img = NamedSharding(mesh, P("dp", None, None, None))
    in_mat = NamedSharding(mesh, P("dp", None, None))
    in_dyn = NamedSharding(mesh, P("dp"))
    out_sh = NamedSharding(mesh, P("dp", "sp", None, None))

    imgs = jax.device_put(imgs, in_img)
    matrices = jax.device_put(matrices, in_mat)
    dyns = jax.tree.map(lambda x: jax.device_put(x, in_dyn), dyns)

    @functools.partial(jax.jit, static_argnames=("cfg",),
                       out_shardings=out_sh)
    def step(imgs, matrices, cfg, dyns):
        return stabilize_window(imgs, matrices, cfg, dyns)

    return step(imgs, matrices, cfg, dyns)

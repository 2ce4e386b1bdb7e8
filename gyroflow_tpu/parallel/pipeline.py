"""Frame-window batch pipeline + multi-chip sharding.

The reference parallelizes frames with rayon inside one process
(fov_iterative.rs:42, render_queue.rs:677). TPU-native: frames are the data-
parallel axis — a window of F frames is stabilized as one jitted program,
sharded across chips via jax.sharding.Mesh ("dp" on frames, "sp" on output
rows). The hot path runs the Pallas kernels per device under `jax.shard_map`
(each device projects + samples its local frame/row shard); no collectives are
needed inside the step because each frame's transform depends only on
precomputed smoothed quats (SURVEY.md §5). The XLA `remap_plane` path remains
as a fallback (`use_pallas=False`).
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

    vmapped XLA remap — single-device fallback path (the sharded Pallas path
    below is the multi-chip hot path).
    """
    return jax.vmap(lambda i, m, d: remap.remap_plane(i, m, cfg, d))(imgs, matrices, dyns)


def make_frame_mesh(n_devices: Optional[int] = None, sp: int = 1) -> Mesh:
    """Mesh over ("dp", "sp"): frames x output-row blocks."""
    devs = jax.devices()
    n = n_devices or len(devs)
    dp = n // sp
    return Mesh(np.asarray(devs[:dp * sp]).reshape(dp, sp), ("dp", "sp"))


def stabilize_window_sharded(mesh: Mesh, imgs, matrices, cfg: KernelConfig,
                             dyns: KernelDynamics, win_h: int = 64,
                             win_w: int = 512, use_pallas: bool = True,
                             win_k: int = 0, tile_w: int = 128,
                             tile_h: int = 8):
    """Frame-window DP across chips (+ output-row sharding on 'sp').

    imgs (F,H,W,C) split over 'dp' (replicated over 'sp'); each device runs
    the Pallas coords+sampler kernels on its local frames for its local
    output-row band (`remap_plane_pallas(out_rows, oy0)` — coordinate math in
    absolute output space, so bands assemble seamlessly). Returns
    (out, overflow): out (F,OH,OW,C) sharded P("dp","sp"), overflow (F, sp)
    bool per (frame, row-band) — any True means that band's source bbox
    exceeded the window and the caller should retry with a larger window.
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    F = imgs.shape[0]
    oh, ow = cfg.output_height, cfg.output_width
    if F % dp != 0:
        raise ValueError(f"frame window {F} not divisible by dp={dp}")
    if oh % sp != 0:
        raise ValueError(f"output height {oh} not divisible by sp={sp}")
    f_local = F // dp
    rows_local = oh // sp

    in_img = NamedSharding(mesh, P("dp", None, None, None))
    in_mat = NamedSharding(mesh, P("dp", None, None))
    in_dyn = NamedSharding(mesh, P("dp"))
    imgs = jax.device_put(imgs, in_img)
    matrices = jax.device_put(matrices, in_mat)
    dyns = jax.tree.map(lambda x: jax.device_put(x, in_dyn), dyns)

    def _local(imgs_l, mats_l, dyns_l):
        # per-device: Pallas kernels over the local frame shard + row band
        oy0 = jax.lax.axis_index("sp") * rows_local
        outs, ovs = [], []
        for i in range(f_local):
            dyn_i = jax.tree.map(lambda x: x[i], dyns_l)
            if use_pallas:
                out, ov = remap.remap_plane_pallas(
                    imgs_l[i], mats_l[i], cfg, dyn_i, win_h=win_h, win_w=win_w,
                    win_k=win_k, tile_w=tile_w, tile_h=tile_h,
                    out_rows=rows_local, oy0=oy0)
            else:
                full = remap.remap_plane(imgs_l[i], mats_l[i], cfg, dyn_i)
                out = jax.lax.dynamic_slice_in_dim(full, oy0, rows_local, axis=0)
                ov = jnp.asarray(False)
            outs.append(out)
            ovs.append(ov)
        return jnp.stack(outs), jnp.stack(ovs).reshape(f_local, 1)

    step = jax.jit(jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P("dp", None, None, None), P("dp", None, None), P("dp")),
        out_specs=(P("dp", "sp", None, None), P("dp", "sp")),
        check_vma=False))
    return step(imgs, matrices, dyns)

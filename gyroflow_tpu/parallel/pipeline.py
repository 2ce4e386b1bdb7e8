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


# ---------------------------------------------------------------------------
# Production window step: compiled once per (mesh, cfg, window, dtype) and
# cached — the render path calls this per frame window (render_queue.rs:677;
# eval config 5 "frame windows sharded across v5e-8").
# ---------------------------------------------------------------------------

_STEP_CACHE: dict = {}


def _mesh_key(mesh: Mesh):
    return (tuple(d.id for d in mesh.devices.flat), tuple(mesh.shape.items()))


def make_window_step(mesh: Mesh, cfg: KernelConfig, f_local: int,
                     win: tuple = (64, 512, 0, 128, 8),
                     use_pallas: bool = True, with_mesh: bool = False,
                     out_dtype=None):
    """Build (and cache) the compiled sharded window step.

    Returns step(imgs, matrices, dyns, mesh_data) -> (out, overflow):
    imgs (F,H,W,C) any input dtype (uint8/uint16 convert in-graph),
    matrices (F,M,14), dyns a KernelDynamics pytree with leading F axis,
    mesh_data (F,L) f32 or None. out is (F,OH,OW,C) sharded P("dp","sp") in
    out_dtype (device-side cast — 2-4x smaller downloads for integer planes),
    overflow (F, sp) bool per (frame, row-band).
    """
    key = (_mesh_key(mesh), cfg, f_local, tuple(win), use_pallas, with_mesh,
           jnp.dtype(out_dtype).name if out_dtype is not None else None)
    step = _STEP_CACHE.get(key)
    if step is not None:
        return step

    sp = mesh.shape["sp"]
    _, oh = cfg.out_buffer          # plane buffer height (chroma may be oh/2)
    if oh % sp != 0:
        raise ValueError(f"plane output height {oh} not divisible by sp={sp}")
    rows_local = oh // sp
    win_h, win_w, win_k, tile_w, tile_h = win[:5]
    win_r = win[5] if len(win) > 5 else 0
    ewa_cap = win[6] if len(win) > 6 else 4
    ewa_cap_y = win[7] if len(win) > 7 else 4

    def _local(imgs_l, mats_l, dyns_l, mesh_l):
        oy0 = jax.lax.axis_index("sp") * rows_local

        def _one(img_i, mats_i, dyn_i, mesh_i):
            if use_pallas:
                out, ov = remap.remap_plane_pallas(
                    img_i, mats_i, cfg, dyn_i, mesh=mesh_i,
                    win_h=win_h, win_w=win_w, win_k=win_k, tile_w=tile_w,
                    tile_h=tile_h, win_r=win_r, ewa_cap=ewa_cap,
                    ewa_cap_y=ewa_cap_y, out_rows=rows_local, oy0=oy0)
            else:
                full = remap.remap_plane(img_i, mats_i, cfg, dyn_i,
                                         mesh=mesh_i)
                out = jax.lax.dynamic_slice_in_dim(full, oy0, rows_local, axis=0)
                ov = jnp.asarray(False)
            if out_dtype == jnp.uint8:
                out = jnp.clip(out, 0, 255).astype(jnp.uint8)
            elif out_dtype == jnp.uint16:
                out = jnp.clip(jnp.rint(out), 0,
                               dyn_i.max_pixel_value).astype(jnp.uint16)
            return out, ov

        # lax.scan over the local frames, not a Python unroll: the scanned
        # program's per-frame device span measures BELOW the per-frame
        # dispatch wall (8.16 vs 9.0 ms at the 4K bench geometry — probes
        # 22/26), it amortizes the per-program launch RPC, and the body
        # compiles once instead of f_local times
        def _body(_, xs):
            img_i, mats_i, dyn_i, mesh_i = xs
            return None, _one(img_i, mats_i, dyn_i, mesh_i)

        if f_local == 1:
            dyn0 = jax.tree.map(lambda x: x[0], dyns_l)
            mesh0 = mesh_l[0] if mesh_l is not None else None
            out, ov = _one(imgs_l[0], mats_l[0], dyn0, mesh0)
            return out[None], jnp.asarray(ov).reshape(1, 1)
        _, (outs, ovs) = jax.lax.scan(
            _body, None, (imgs_l, mats_l, dyns_l, mesh_l))
        return outs, ovs.reshape(f_local, 1)

    img_spec = P("dp", None, None, None)
    mat_spec = P("dp", None, None)
    mesh_spec = P("dp", None) if with_mesh else None
    if not with_mesh:
        # shard_map requires a spec per argument; bind mesh_l=None statically
        fn = lambda i, m, d: _local(i, m, d, None)
        in_specs = (img_spec, mat_spec, P("dp"))
        sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                out_specs=(P("dp", "sp", None, None),
                                           P("dp", "sp")),
                                check_vma=False)
        jitted = jax.jit(sharded)
        step_fn = lambda imgs, mats, dyns, mesh_data=None: jitted(imgs, mats, dyns)
    else:
        in_specs = (img_spec, mat_spec, P("dp"), mesh_spec)
        sharded = jax.shard_map(_local, mesh=mesh, in_specs=in_specs,
                                out_specs=(P("dp", "sp", None, None),
                                           P("dp", "sp")),
                                check_vma=False)
        jitted = jax.jit(sharded)
        step_fn = lambda imgs, mats, dyns, mesh_data: jitted(imgs, mats, dyns,
                                                             mesh_data)
    _STEP_CACHE[key] = step_fn
    return step_fn


def place_window(mesh: Mesh, imgs, matrices, dyns, mesh_data=None):
    """device_put window operands with the dp-sharded layout the step expects."""
    in_img = NamedSharding(mesh, P("dp", None, None, None))
    in_mat = NamedSharding(mesh, P("dp", None, None))
    in_dyn = NamedSharding(mesh, P("dp"))
    imgs = jax.device_put(imgs, in_img)
    matrices = jax.device_put(matrices, in_mat)
    dyns = jax.tree.map(lambda x: jax.device_put(x, in_dyn), dyns)
    if mesh_data is not None:
        mesh_data = jax.device_put(
            mesh_data, NamedSharding(mesh, P("dp", None)))
    return imgs, matrices, dyns, mesh_data


# window-size ladder shared with the single-frame path (manager.process_pixels):
# rolled (win_k=128) configs first, then classic full-width windows for
# stronger zoom-out; tile_h=16 is the measured knee at 4K (STATUS.md)
WINDOW_LADDER = ((24, 256, 128, 96, 16, 16), (32, 256, 128, 96, 16, 24),
                 (40, 256, 128, 96, 16, 32), (48, 256, 128, 96, 16, 40),
                 (40, 256, 0, 128, 16, 32), (48, 384, 0, 128, 16, 40),
                 (56, 384, 0, 128, 16, 48), (72, 512, 0, 128, 16, 64),
                 (104, 768, 0, 128, 16, 96))

# EWA prefers 8-row tiles: its per-tap weights evaluate over the WHOLE row
# band (Kh, P) — not a bit-select tree — so the band height is the dominant
# VPU cost and halving the per-tile v-spread (th8 vs th16) buys a tighter
# win_r rung (measured 11.4 vs 12.7 ms 1080p interp-11 on v5e).
# 7th/8th elements: ewa_cap_x, ewa_cap_y (per-axis stencil radii;
# taps = 2*cap+2). The kernel's tap LOOP runs over X taps, and the needed
# X radius — min(reference bbox, dr<=4 ellipse support) — is ~2 for almost
# all real content (measured: 2.00 mild lens, 2.13 max on the bench
# fisheye), so the cap_x=2/3 rungs run 6/8 loop iterations instead of the
# legacy 10. The Y radius spikes to ~5-9 on per-row-RS content (the
# reference's finite-difference jacobian crosses RS matrix-row
# boundaries), so Y escalates separately; cap 4 rungs are the legacy
# fixed stencil with NO check (radius > 4 truncates bc2-tail taps —
# documented deviation, STATUS.md). The exact jac-derived check in
# remap_plane_pallas escalates through the ladder
# (cpu_undistort.rs:272-277 dynamic bbox, ladder-quantized).
EWA_WINDOW_LADDER = ((24, 256, 128, 96, 8, 16, 2, 2),
                     (32, 256, 128, 96, 8, 24, 2, 2),
                     (32, 256, 128, 96, 8, 24, 2, 4),
                     (32, 256, 128, 96, 8, 24, 3, 4),
                     (40, 256, 128, 96, 8, 32, 3, 4),
                     (40, 256, 128, 96, 8, 32, 4, 4),
                     (48, 384, 128, 96, 8, 40, 4, 4),
                     (48, 384, 0, 128, 8, 0, 4, 4),
                     (72, 512, 0, 128, 8, 64, 4, 4),
                     (104, 768, 0, 128, 8, 96, 4, 4))


def ladder_for(cfg: KernelConfig):
    """Window ladder for a kernel config (EWA uses 8-row tiles, see above)."""
    return EWA_WINDOW_LADDER if cfg.interpolation > 8 else WINDOW_LADDER


def stabilize_window_production(mesh: Mesh, imgs, matrices, cfg: KernelConfig,
                                dyns: KernelDynamics, mesh_data=None,
                                use_pallas: bool = True, out_dtype=None,
                                win_cache: Optional[dict] = None,
                                stats: Optional[dict] = None):
    """The production multi-chip window: Pallas under shard_map with the
    per-band overflow retry ladder, falling back to the XLA remap path when
    every window candidate overflows (stabilization/mod.rs:642-718 fallback
    chain, at window-batch granularity).

    Returns (out (F,OH,OW,C) np-convertible, backend string).
    win_cache, keyed like manager._win_cache, persists the chosen window
    across windows of the same render; stats counts reprobes/fallbacks.
    """
    dp = mesh.shape["dp"]
    F = imgs.shape[0]
    if F % dp != 0:
        raise ValueError(f"frame window {F} not divisible by dp={dp}")
    f_local = F // dp
    with_mesh = mesh_data is not None
    imgs, matrices, dyns, mesh_data = place_window(mesh, imgs, matrices, dyns,
                                                   mesh_data)

    wkey = ("window", cfg, tuple(imgs.shape))
    cached = win_cache.get(wkey) if win_cache is not None else None
    ladder = ((cached,) if cached is not None else ()) + tuple(
        w for w in ladder_for(cfg) if w != cached)
    if use_pallas:
        for win in ladder:
            try:
                step = make_window_step(mesh, cfg, f_local, win, True,
                                        with_mesh, out_dtype)
                out, ov = step(imgs, matrices, dyns, mesh_data)
            except Exception:  # noqa: BLE001 — a rung that fails to compile
                # (Mosaic scoped-vmem OOM on some geometry/cap combinations)
                # walks the ladder like an overflow
                if stats is not None:
                    stats["window_compile_fails"] = \
                        stats.get("window_compile_fails", 0) + 1
                continue
            if not bool(jnp.any(ov)):
                if win_cache is not None:
                    if cached is not None and win != cached and stats is not None:
                        stats["window_reprobes"] = stats.get("window_reprobes", 0) + 1
                    win_cache[wkey] = win
                return out, "pallas-tpu-sharded"
        if win_cache is not None:
            # every rung overflowed: evict so the next window goes straight
            # to the ladder instead of re-dispatching a known-stale rung
            win_cache.pop(wkey, None)
        if stats is not None:
            stats["xla_fallbacks"] = stats.get("xla_fallbacks", 0) + 1
    step = make_window_step(mesh, cfg, f_local, WINDOW_LADDER[0], False,
                            with_mesh, out_dtype)
    out, _ = step(imgs, matrices, dyns, mesh_data)
    return out, "xla-sharded"

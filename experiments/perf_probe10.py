"""Probe 10: plan_windows_t (XLA) vs _plan_call (Pallas) standalone.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe10.py
"""
import numpy as np

from perf_probe import timed


def main():
    import jax
    import jax.numpy as jnp
    from gyroflow_tpu.ops import pallas_sampler as ps

    rng = np.random.default_rng(0)
    W, H = 3840, 2160
    TILE_H, TILE_W = 16, 96
    spec = ps.SamplerSpec.create(height=H, width=W, out_height=H, out_width=W,
                                 interpolation=8, tile_h=TILE_H, tile_w=TILE_W,
                                 win_h=24, win_w=256, win_k=128)
    ntiles = spec.grid[0] * spec.grid[1]
    P = TILE_H * TILE_W
    u = jnp.asarray(rng.uniform(0, W - 64, (ntiles, P)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, H - 64, (ntiles, P)).astype(np.float32))
    m = jnp.ones((ntiles, P), jnp.float32)

    @jax.jit
    def xla(u, v, m, salt):
        y0, x0, xoff, _yoff, ovf = ps.plan_windows_t(spec, u + salt, v, m > 0.5)
        return jnp.sum(y0) + jnp.sum(x0) + jnp.sum(xoff) + ovf.astype(jnp.float32)

    @jax.jit
    def pallas(u, v, m, salt):
        y0, x0, xoff, ovf = ps._plan_call(spec, u + salt, v, m)
        return jnp.sum(y0) + jnp.sum(x0) + jnp.sum(xoff) + ovf.astype(jnp.float32)

    print("xla   ", round(timed(xla, u, v, m), 3), flush=True)
    print("pallas", round(timed(pallas, u, v, m), 3), flush=True)

    # cross-check outputs
    a = jax.jit(lambda u, v, m: ps.plan_windows_t(spec, u, v, m > 0.5))(u, v, m)
    b = jax.jit(lambda u, v, m: ps._plan_call(spec, u, v, m))(u, v, m)
    for i, name in enumerate(("y0", "x0", "xoff")):
        diff = int(jnp.max(jnp.abs(a[i] - b[i])))
        print(name, "max diff", diff)
    print("ovf", bool(a[3]), bool(b[3]))


if __name__ == "__main__":
    main()

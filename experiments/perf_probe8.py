"""Probe 8: VPU cost of (1,P) rows vs (8,P/8) blocks, and relayout cost.

PYTHONPATH=/root/repo:/root/.axon_site python experiments/perf_probe8.py
"""
import json

import numpy as np

from perf_probe import timed


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 1536
    P8 = P // 8
    ntiles = 5400
    NOPS = 100
    results = {}

    def mk(shape_in, body):
        def kern(x_ref, o_ref):
            o_ref[:] = body(x_ref[:])
        return kern

    def chain(x):
        # ~NOPS elementwise ops
        acc = x
        for i in range(NOPS // 4):
            acc = acc * 1.000001 + 0.5
            acc = jnp.maximum(acc - 0.25, 0.0)
        return acc

    # (ntiles, 1, P) blocks
    x1 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (ntiles, 1, P)).astype(np.float32))
    f1 = pl.pallas_call(
        mk((1, P), chain),
        out_shape=jax.ShapeDtypeStruct((ntiles, 1, P), jnp.float32),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0)))

    @jax.jit
    def run1(x, salt):
        return jnp.sum(f1(x + salt)) + salt

    results[f"rows (1,{P}) x{NOPS}ops"] = round(timed(run1, x1), 3)
    print("rows", results[f"rows (1,{P}) x{NOPS}ops"], flush=True)

    # (ntiles, 8, P8) blocks
    x8 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (ntiles, 8, P8)).astype(np.float32))
    f8 = pl.pallas_call(
        mk((8, P8), chain),
        out_shape=jax.ShapeDtypeStruct((ntiles, 8, P8), jnp.float32),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((1, 8, P8), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, P8), lambda i: (i, 0, 0)))

    @jax.jit
    def run8(x, salt):
        return jnp.sum(f8(x + salt)) + salt

    results[f"blocks (8,{P8}) x{NOPS}ops"] = round(timed(run8, x8), 3)
    print("blocks", results[f"blocks (8,{P8}) x{NOPS}ops"], flush=True)

    # relayout inside kernel: compute in (8,P8), reshape to (1,P), touch, write
    def kern_relayout(x_ref, o_ref):
        a = chain(x_ref[0])                        # (8, P8)
        flat = a.reshape(1, P)                     # sublane->lane relayout
        o_ref[0] = flat + 1.0

    fr = pl.pallas_call(
        kern_relayout,
        out_shape=jax.ShapeDtypeStruct((ntiles, 1, P), jnp.float32),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((1, 8, P8), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0)))

    @jax.jit
    def runr(x, salt):
        return jnp.sum(fr(x + salt)) + salt

    try:
        results["blocks+1 relayout"] = round(timed(runr, x8), 3)
    except Exception as e:
        results["blocks+1 relayout"] = f"ERR {str(e)[:200]}"
    print("relayout", results["blocks+1 relayout"], flush=True)

    # 10 relayouts per tile
    def kern_relayout10(x_ref, o_ref):
        a = x_ref[0]
        acc = jnp.zeros((1, P), jnp.float32)
        for i in range(10):
            acc = acc + (a + float(i)).reshape(1, P)
        o_ref[0] = acc

    fr10 = pl.pallas_call(
        kern_relayout10,
        out_shape=jax.ShapeDtypeStruct((ntiles, 1, P), jnp.float32),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((1, 8, P8), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0)))

    @jax.jit
    def runr10(x, salt):
        return jnp.sum(fr10(x + salt)) + salt

    try:
        results["blocks+10 relayouts"] = round(timed(runr10, x8), 3)
    except Exception as e:
        results["blocks+10 relayouts"] = f"ERR {str(e)[:200]}"
    print("relayout10", results["blocks+10 relayouts"], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

"""Probe: lax.sort throughput and Pallas grid-step overhead on the TPU.

Uses the same dispatch-loop timing protocol as sweep_packet/sweep_tile
(warm, then reps + one block_until_ready) so numbers are comparable.

Why: XLA gather measures ~19 ns/element on this backend (useless for ray
reordering), but applying a permutation can ride multi-operand
lax.sort_key_val if sort is fast. Grid overhead sizes how much of the
tile kernel's time is fixed per-step cost.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    results = {}
    key = jax.random.PRNGKey(0)
    n = 480_000

    keys = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32)
    ops = [jax.random.normal(jax.random.fold_in(key, i), (n,), jnp.float32)
           for i in range(8)]

    @jax.jit
    def sort1(k, v):
        return jax.lax.sort_key_val(k, v)

    results["sort_kv_480k"] = timeit(sort1, keys, ops[0])

    @jax.jit
    def sort8(k, *vs):
        return jax.lax.sort((k,) + vs, num_keys=1)

    results["sort_8op_480k"] = timeit(sort8, keys, *ops)

    @jax.jit
    def argsortg(k, v):
        i = jnp.argsort(k)
        return v[i]

    results["argsort_gather_480k"] = timeit(argsortg, keys, ops[0])

    @jax.jit
    def cumsum480k(v):
        return jnp.cumsum(v.astype(jnp.int32))

    results["cumsum_480k"] = timeit(cumsum480k, keys)

    # one-hot matmul lane-gather: permute 480k f32 via sort of positions
    @jax.jit
    def perm_via_sort(pos, *vs):
        return jax.lax.sort((pos,) + vs, num_keys=1)

    pos = jax.random.permutation(key, n).astype(jnp.int32)
    results["permute8_via_sort_480k"] = timeit(perm_via_sort, pos, *ops)

    # Pallas grid overhead: trivial kernel, grid=G, (8,128) in/out per step
    def triv(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    for g in (4_096, 45_056):
        x = jax.random.normal(key, (g * 8, 128), jnp.float32)

        @jax.jit
        def run(x):
            return pl.pallas_call(
                triv,
                grid=(g,),
                in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((g * 8, 128), jnp.float32),
            )(x)

        dt = timeit(run, x)
        results[f"grid_{g}"] = dt
        results[f"grid_{g}_per_step_ns"] = dt / g * 1e9

    print("RESULT " + json.dumps(
        {k: round(v, 6) for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()

"""Per-grid-step cost vs number of buffer streams (null kernel)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n_groups = 128
rows = 16
tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
key = jax.random.PRNGKey(0)

cases = [(1, 1), (2, 1), (4, 1), (7, 1), (1, 2), (1, 5), (7, 5),
         (12, 1), (1, 12)]
runs = {}
for n_in, n_out in cases:
    ins = [jax.random.uniform(jax.random.fold_in(key, i),
                              (n_groups * rows, 128)) for i in range(n_in)]

    def kern(*refs, n_out=n_out):
        for o in refs[-n_out:]:
            o[:] = refs[0][:]

    @jax.jit
    def run(*p):
        return pl.pallas_call(
            kern, grid=(n_groups,),
            in_specs=[tile()] * len(p),
            out_specs=[tile()] * n_out, out_shape=[out_shape] * n_out,
        )(*p)

    runs[(n_in, n_out)] = (run, ins)

for k, (fn, ins) in runs.items():
    jax.block_until_ready(fn(*ins))

mins = {k: float("inf") for k in runs}
for rnd in range(6):
    for k, (fn, ins) in runs.items():
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*ins)
        jax.block_until_ready(out)
        mins[k] = min(mins[k], (time.perf_counter() - t0) / 5)

for (n_in, n_out), dt in mins.items():
    print(f"in={n_in:2d} out={n_out:2d} (streams={n_in+n_out:2d}): "
          f"{dt*1e3:8.3f} ms  {dt/n_groups*1e6:7.2f} us/step")

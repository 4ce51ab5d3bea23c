"""device_get poisoning: recovery? alternative transfer paths?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n_groups = 128
rows = 16
tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
xs = [jax.random.uniform(jax.random.PRNGKey(i), (n_groups * rows, 128))
      for i in range(7)]


def kern(*refs):
    for o in refs[-5:]:
        o[:] = refs[0][:]


@jax.jit
def run(*p):
    return pl.pallas_call(
        kern, grid=(n_groups,),
        in_specs=[tile()] * 7,
        out_specs=[tile()] * 5, out_shape=[out_shape] * 5,
    )(*p)


def bench(label, n_rounds=3):
    jax.block_until_ready(run(*xs))
    m = float("inf")
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(*xs)
        jax.block_until_ready(out)
        m = min(m, (time.perf_counter() - t0) / 5)
    print(f"  {label:36s}: {m/n_groups*1e6:7.2f} us/step", flush=True)


mode = sys.argv[1] if len(sys.argv) > 1 else "recover"
x_small = jnp.ones((16,), jnp.float32)

if mode == "recover":
    bench("clean")
    _ = jax.device_get(x_small)
    bench("right after get")
    time.sleep(2)
    bench("after 2s sleep")
    for _ in range(200):
        out = run(*xs)
    jax.block_until_ready(out)
    bench("after 200 more calls")
elif mode == "paths":
    bench("clean")
    # copy_to_host_async then read
    y = jnp.ones((16,), jnp.float32)
    y.copy_to_host_async()
    time.sleep(0.1)
    _ = np.asarray(y)
    bench("after copy_to_host_async+asarray")
elif mode == "putonly":
    bench("clean")
    _ = jax.device_put(np.ones(1024, np.float32))
    jax.block_until_ready(_)
    bench("after device_put")
elif mode == "item":
    bench("clean")
    v = float(jnp.sum(x_small))  # scalar readback
    bench("after float(scalar)")

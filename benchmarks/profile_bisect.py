"""Bisect which I/O factor costs ~20us/grid-step."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


n_groups = 128
rows = 16
tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
x = jnp.ones((n_groups * rows, 128), jnp.float32)


def case(name, in_specs, extra_inputs, pass_as_args=True):
    def kern(*refs):
        refs[-1][:] = refs[-2][:] * 2.0

    if pass_as_args:
        @jax.jit
        def run(x, extras):
            return pl.pallas_call(
                kern, grid=(n_groups,),
                in_specs=in_specs + [tile()],
                out_specs=tile(), out_shape=out_shape,
            )(*extras, x)
        dt = timeit(run, x, extra_inputs)
    else:
        @jax.jit
        def run():
            return pl.pallas_call(
                kern, grid=(n_groups,),
                in_specs=in_specs + [tile()],
                out_specs=tile(), out_shape=out_shape,
            )(*extra_inputs, x)
        dt = timeit(run)
    print(f"{name:40s}: {dt*1e3:7.3f} ms ({dt/n_groups*1e6:6.2f} us/step)")


smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

case("baseline 1in/1out", [], [])
case("smem len8 x9 (args)", [smem()] * 9,
     [jnp.ones(8, jnp.float32)] * 9)
case("smem len5 x9 (args)", [smem()] * 9,
     [jnp.ones(5, jnp.float32)] * 9)
case("smem len5 x9 (closure)", [smem()] * 9,
     [jnp.ones(5, jnp.float32)] * 9, pass_as_args=False)
case("vmem (3,128) full (args)", [vmem()],
     [jnp.ones((3, 128), jnp.float32)])
case("vmem (3,128) full (closure)", [vmem()],
     [jnp.ones((3, 128), jnp.float32)], pass_as_args=False)
case("vmem (8,128) full (args)", [vmem()],
     [jnp.ones((8, 128), jnp.float32)])
case("smem5x9 + vmem(3,128) (args)", [smem()] * 9 + [vmem()],
     [jnp.ones(5, jnp.float32)] * 9 + [jnp.ones((3, 128), jnp.float32)])
case("baseline (closure)", [], [], pass_as_args=False)

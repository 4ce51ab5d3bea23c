"""When exactly is a full-array VMEM input slow per grid step?"""

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
vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)


def case(name, body, tri_rows=3):
    tri = jnp.ones((tri_rows, 128), jnp.float32)

    def kern(t_ref, x_ref, o_ref):
        body(t_ref, x_ref, o_ref)

    @jax.jit
    def run(tri, x):
        return pl.pallas_call(
            kern, grid=(n_groups,),
            in_specs=[vmem(), tile()],
            out_specs=tile(), out_shape=out_shape,
        )(tri, x)

    dt = timeit(run, tri, x)
    print(f"{name:44s}: {dt*1e3:7.3f} ms ({dt/n_groups*1e6:6.2f} us/step)")


case("unused tri", lambda t, x, o: o.__setitem__(slice(None), x[:] * 2.0))
case("scalar-read tri t[0,0]",
     lambda t, x, o: o.__setitem__(slice(None), x[:] + t[0, 0]))
case("static row t[0:1,:]",
     lambda t, x, o: o.__setitem__(slice(None), x[:] + t[0:1, :]))


def dyn_body(t, x, o):
    i = pl.program_id(0)
    r = t[pl.ds(jnp.where(i < 2, i, 0), 1), :]
    o[:] = x[:] + r


case("dynamic row t[pl.ds(i,1),:]", dyn_body)
case("unused tri 6828 rows",
     lambda t, x, o: o.__setitem__(slice(None), x[:] * 2.0), tri_rows=6828)
case("scalar-read tri 6828",
     lambda t, x, o: o.__setitem__(slice(None), x[:] + t[0, 0]),
     tri_rows=6828)
case("dynamic row 6828", dyn_body, tri_rows=6828)

# repeat unused to check noise
case("unused tri (repeat)",
     lambda t, x, o: o.__setitem__(slice(None), x[:] * 2.0))

"""Is the per-grid-step overhead the 9 SMEM input re-copies?

Null kernel, 128 grid steps, vary the number of SMEM inputs and try
scalar-prefetch (copied once) vs plain SMEM specs (copied per step).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    n_groups = 128
    rows = 16
    x = jnp.ones((n_groups * rows, 128), jnp.float32)
    out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
    tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

    for n_nodes in [8, 4096]:
        smem_arrs = [jnp.ones(n_nodes, jnp.float32) for _ in range(9)]

        for n_smem in [0, 1, 9]:
            def kern(*refs):
                refs[-1][:] = refs[-2][:] * 2.0

            @jax.jit
            def run(x, arrs):
                return pl.pallas_call(
                    kern,
                    grid=(n_groups,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
                    + [tile()],
                    out_specs=tile(),
                    out_shape=out_shape,
                )(*arrs[:n_smem], x)

            dt = timeit(run, x, smem_arrs)
            print(f"nodes={n_nodes:5d} smem_inputs={n_smem}: "
                  f"{dt*1e3:7.3f} ms ({dt/n_groups*1e6:6.2f} us/step)")

        # scalar prefetch variant (copied once before grid)
        def kern_pf(*refs):
            refs[-1][:] = refs[-2][:] * 2.0

        tile_pf = lambda: pl.BlockSpec(
            (rows, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )

        @jax.jit
        def run_pf(x, arrs):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=9,
                grid=(n_groups,),
                in_specs=[tile_pf()],
                out_specs=tile_pf(),
            )
            return pl.pallas_call(
                kern_pf, grid_spec=gs, out_shape=out_shape
            )(*arrs, x)

        dt = timeit(run_pf, x, smem_arrs)
        print(f"nodes={n_nodes:5d} prefetch=9:     "
              f"{dt*1e3:7.3f} ms ({dt/n_groups*1e6:6.2f} us/step)")

    # VMEM full-array input re-copy cost (tri_rows analog)
    for r in [8, 6828]:
        tri = jnp.ones((r, 128), jnp.float32)

        def kern2(t_ref, x_ref, o_ref):
            o_ref[:] = x_ref[:] + t_ref[0, 0]

        @jax.jit
        def run2(tri, x):
            return pl.pallas_call(
                kern2,
                grid=(n_groups,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), tile()],
                out_specs=tile(),
                out_shape=out_shape,
            )(tri, x)

        dt = timeit(run2, tri, x)
        print(f"vmem full input rows={r:5d}: {dt*1e3:7.3f} ms "
              f"({dt/n_groups*1e6:6.2f} us/step)")


if __name__ == "__main__":
    main()


def exact_io():
    """Exact I/O combo of the packet kernel, null body."""
    n_groups = 128
    rows = 16
    tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
    smem_arrs = [jnp.ones(5, jnp.float32) for _ in range(9)]
    tri = jnp.ones((3, 128), jnp.float32)
    packed = [jnp.ones((n_groups * rows, 128), jnp.float32)
              for _ in range(7)]

    for n_in, n_out in [(1, 1), (7, 1), (1, 5), (7, 5)]:
        def kern(*refs):
            tm = refs[9 + n_in]  # after 9 smem + tri... adjust
            for r in refs[-n_out:]:
                r[:] = refs[10][:] * 2.0

        @jax.jit
        def run():
            return pl.pallas_call(
                kern,
                grid=(n_groups,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 9
                + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                + [tile()] * n_in,
                out_specs=[tile()] * n_out,
                out_shape=[out_shape] * n_out,
            )(*smem_arrs, tri, *packed[:n_in])

        dt = timeit(run)
        print(f"tiles in={n_in} out={n_out}: {dt*1e3:7.3f} ms "
              f"({dt/n_groups*1e6:6.2f} us/step)")


exact_io()

"""From null kernel upward: what makes a grid step cost 50us?"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.kernels import packet as pk

n = 262144
group = pk.PACKET
n_groups = n // group
rows = group // 128
n_nodes = 5

key = jax.random.PRNGKey(0)
packed = [jax.random.uniform(jax.random.fold_in(key, i),
                             (n_groups * rows, 128), jnp.float32) + 0.1
          for i in range(7)]
smem_arrs = [jnp.ones(n_nodes, jnp.float32) for _ in range(6)] + [
    jnp.ones(n_nodes, jnp.int32) for _ in range(3)]
tri = jnp.ones((3, 128), jnp.float32)

smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)


def build(body):
    def kern(*refs):
        body(refs[9], refs[10:17], refs[17:22])

    @jax.jit
    def run(*p):
        return pl.pallas_call(
            kern, grid=(n_groups,),
            in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
            out_specs=[tile()] * 5, out_shape=[out_shape] * 5,
        )(*smem_arrs, tri, *p)

    return run


def b_null(tri_ref, ins, outs):
    for o in outs:
        o[:] = ins[-1][:]


def b_prologue(tri_ref, ins, outs):
    ox, oy, oz, dx, dy, dz, tmax = [r[:] for r in ins]
    ivx = pk._safe_inv(dx); ivy = pk._safe_inv(dy); ivz = pk._safe_inv(dz)
    oix, oiy, oiz = ox * ivx, oy * ivy, oz * ivz
    outs[0][:] = tmax
    outs[1][:] = jnp.zeros_like(tmax)
    outs[2][:] = jnp.zeros_like(tmax)
    outs[3][:] = jnp.full_like(tmax, -1.0)
    outs[4][:] = oix + oiy + oiz  # keep them live


def b_fori_scalar(tri_ref, ins, outs):
    b_null(tri_ref, ins, outs)
    def body(i, c):
        return c + 1
    r = jax.lax.fori_loop(0, 16, body, jnp.int32(0))
    outs[0][0:1, :] = jnp.full((1, 128), 1.0) * r.astype(jnp.float32)


def b_while_scalar(tri_ref, ins, outs):
    b_null(tri_ref, ins, outs)
    def cond(c):
        return c[0] < 16
    def body(c):
        return (c[0] + 1,)
    r = jax.lax.while_loop(cond, body, (jnp.int32(0),))
    outs[0][0:1, :] = jnp.full((1, 128), 1.0) * r[0].astype(jnp.float32)


def b_fori_vec(tri_ref, ins, outs):
    """fori over 16 steps each doing one (16,128) vector op on outs."""
    b_null(tri_ref, ins, outs)
    def body(i, c):
        outs[4][:] = outs[4][:] + 1.0
        return c
    jax.lax.fori_loop(0, 16, body, jnp.int32(0))


def b_smem_reads(tri_ref, ins, outs):
    b_null(tri_ref, ins, outs)
    def body(i, c):
        return c + smem_read_sum(i)
    def smem_read_sum(i):
        return jnp.int32(1)
    jax.lax.fori_loop(0, 16, body, jnp.int32(0))


variants = {
    "null": build(b_null),
    "prologue": build(b_prologue),
    "fori16 scalar": build(b_fori_scalar),
    "while16 scalar": build(b_while_scalar),
    "fori16 vec-op": build(b_fori_vec),
}

for name, fn in variants.items():
    jax.block_until_ready(fn(*packed))

mins = {name: float("inf") for name in variants}
for rnd in range(6):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*packed)
        jax.block_until_ready(out)
        mins[name] = min(mins[name], (time.perf_counter() - t0) / 5)

for name, dt in mins.items():
    print(f"{name:16s}: {dt*1e3:8.3f} ms  {dt/n_groups*1e6:7.2f} us/group")

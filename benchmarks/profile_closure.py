"""Confirm: closure-constant device arrays vs jit args, real packet kernel."""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.bvh.cluster import build_packet_accel
from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
from tpurt.kernels import packet as pk
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.loader import load_scene

SCENE = os.environ.get("SCENE", "cornell")
scene = load_scene(SCENE)
meta = scene_meta(scene)
ds = to_device(scene)
accel = build_packet_accel(ds, meta)
w, h = (512, 512) if SCENE == "cornell" else (800, 600)
px, py = full_frame_pixels_tiled(w, h)
o, d = camera_rays(scene.camera, px, py, w, h)
n = o.shape[0]

group = pk.PACKET
n_groups = max(1, math.ceil(n / group))
padded = n_groups * group
rows = group // 128
tables = tuple(
    jnp.asarray(getattr(accel, f))
    for f in ["node_bminx", "node_bminy", "node_bminz", "node_bmaxx",
              "node_bmaxy", "node_bmaxz", "node_first", "node_count",
              "node_skip", "tri_rows"]
)
packed = jax.block_until_ready(jax.jit(lambda o, d: (
    pk._pack(o[:, 0], padded, 0.0), pk._pack(o[:, 1], padded, 0.0),
    pk._pack(o[:, 2], padded, 0.0), pk._pack(d[:, 0], padded, 1.0),
    pk._pack(d[:, 1], padded, 1.0), pk._pack(d[:, 2], padded, 1.0),
    pk._pack(jnp.full(n, 3.4e38, jnp.float32), padded, -1.0),
))(o, d))

smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
kernel = functools.partial(pk._packet_kernel, n_nodes=accel.n_nodes,
                           any_hit=False)


def call(*all_args):
    return pl.pallas_call(
        kernel, grid=(n_groups,),
        in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
        out_specs=[tile()] * 5, out_shape=[out_shape] * 5,
    )(*all_args)


@jax.jit
def run_closure(*p):
    return call(*tables, *p)


@jax.jit
def run_args(tables, *p):
    return call(*tables, *p)


jax.block_until_ready(run_closure(*packed))
jax.block_until_ready(run_args(tables, *packed))

m_c = m_a = float("inf")
for rnd in range(6):
    t0 = time.perf_counter()
    for _ in range(5):
        out = run_closure(*packed)
    jax.block_until_ready(out)
    m_c = min(m_c, (time.perf_counter() - t0) / 5)
    t0 = time.perf_counter()
    for _ in range(5):
        out = run_args(tables, *packed)
    jax.block_until_ready(out)
    m_a = min(m_a, (time.perf_counter() - t0) / 5)

print(f"{SCENE}: closure {m_c*1e3:8.3f} ms ({n/m_c/1e6:7.1f} Mrays/s)   "
      f"args {m_a*1e3:8.3f} ms ({n/m_a/1e6:7.1f} Mrays/s)  "
      f"[{n_groups} groups]")

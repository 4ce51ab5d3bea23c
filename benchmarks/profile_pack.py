"""Where do the 2.9ms of ray packing go, and what's the true bunny
kernel-only cost? min-of-repeats timing."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def best(fn, *args, n=5, inner=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts)


N = 262144
G = N // 128
org = jnp.ones((N, 3), jnp.float32)
ox_soa = [jnp.ones(N, jnp.float32) for _ in range(3)]


@jax.jit
def pack_aos(org):
    return [org[:, i].reshape(G, 128) for i in range(3)]


@jax.jit
def pack_transpose(org):
    t = org.T.reshape(3, G, 128)
    return [t[0], t[1], t[2]]


@jax.jit
def pack_soa(ox, oy, oz):
    return [a.reshape(G, 128) for a in (ox, oy, oz)]


print(f"pack AoS cols   : {best(pack_aos, org)*1e3:7.3f} ms")
print(f"pack transpose  : {best(pack_transpose, org)*1e3:7.3f} ms")
print(f"pack SoA reshape: {best(pack_soa, *ox_soa)*1e3:7.3f} ms")

# true bunny kernel cost, pre-packed, min-of-repeats
from tpurt.bvh.cluster import build_packet_accel
from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
from tpurt.kernels import packet as pk
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.loader import load_scene

for name, w, h in [("cornell", 512, 512), ("bunny", 800, 600)]:
    scene = load_scene(name)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_packet_accel(ds, meta)
    px, py = full_frame_pixels_tiled(w, h)
    o, d = camera_rays(scene.camera, px, py, w, h)
    n = o.shape[0]
    closest, _ = pk.make_packet_intersector(ds, accel, ray_sort="none")
    run = jax.jit(lambda o, d: closest(o, d, 0.0, jnp.inf).t)
    dt = best(run, o, d)
    print(f"{name}: full path {dt*1e3:8.3f} ms = {n/dt/1e6:7.1f} Mrays/s "
          f"(n={n})")

    # kernel-only: pre-pack inputs, direct _trace without sort
    group = pk.PACKET * pk.ILEAVE
    import math
    n_groups = max(1, math.ceil(n / group))
    padded = n_groups * group
    tables = tuple(
        jnp.asarray(getattr(accel, f))
        for f in ["node_bminx", "node_bminy", "node_bminz", "node_bmaxx",
                  "node_bmaxy", "node_bmaxz", "node_first", "node_count",
                  "node_skip", "tri_rows"]
    )
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packed = jax.block_until_ready(jax.jit(lambda o, d: (
        pk._pack(o[:, 0], padded, 0.0), pk._pack(o[:, 1], padded, 0.0),
        pk._pack(o[:, 2], padded, 0.0), pk._pack(d[:, 0], padded, 1.0),
        pk._pack(d[:, 1], padded, 1.0), pk._pack(d[:, 2], padded, 1.0),
        pk._pack(jnp.full(n, 3.4e38, jnp.float32), padded, -1.0),
    ))(o, d))
    rows = (pk.PACKET // 128) * pk.ILEAVE
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
    kernel = functools.partial(pk._packet_kernel, n_nodes=accel.n_nodes,
                               any_hit=False)

    @jax.jit
    def run_k(*p):
        return pl.pallas_call(
            kernel, grid=(n_groups,),
            in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
            out_specs=[tile()] * 5, out_shape=[out_shape] * 5,
        )(*tables, *p)

    dt = best(run_k, *packed)
    print(f"{name}: kernel-only {dt*1e3:8.3f} ms = {n/dt/1e6:7.1f} Mrays/s "
          f"({dt/n_groups*1e6:.1f} us/group, {n_groups} groups)")

"""Ablate the packet kernel body to find the ~85us/group fixed cost.

All variants run in ONE process, interleaved rounds, pipelined timing
(N calls queued then one block), per-variant min across rounds.
"""

import functools
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
print(f"scene={SCENE} n={n} nodes={accel.n_nodes} rows={accel.n_rows}")

group = pk.PACKET
n_groups = max(1, math.ceil(n / group))
padded = n_groups * group
rows = pk.PACKET // 128
n_nodes = accel.n_nodes

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


def make_variant(mode, strip=8, max_outer=None):
    """mode: full | noleaf | nowhile | boxonly_fori | empty_loop"""

    def kern(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
             first_r, count_r, skip_r, tri_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
             bt_ref, bu_ref, bv_ref, bs_ref, stat_ref):
        ox = ox_ref[:]
        oy = oy_ref[:]
        oz = oz_ref[:]
        dx = dx_ref[:]
        dy = dy_ref[:]
        dz = dz_ref[:]
        ivx = pk._safe_inv(dx)
        ivy = pk._safe_inv(dy)
        ivz = pk._safe_inv(dz)
        oix, oiy, oiz = ox * ivx, oy * ivy, oz * ivz
        tmax = tmax_ref[:]
        bt_ref[:] = tmax
        bu_ref[:] = jnp.zeros_like(tmax)
        bv_ref[:] = jnp.zeros_like(tmax)
        bs_ref[:] = jnp.full_like(tmax, -1.0)
        stat_ref[:] = jnp.zeros_like(tmax)

        def step(node):
            live = node < n_nodes
            nid = jnp.where(live, node, 0)
            bnx = bminx[nid]; bny = bminy[nid]; bnz = bminz[nid]
            bxx = bmaxx[nid]; bxy = bmaxy[nid]; bxz = bmaxz[nid]
            cnt = count_r[nid]; skp = skip_r[nid]
            bt = bt_ref[:]
            t0x = bnx * ivx - oix; t1x = bxx * ivx - oix
            t0y = bny * ivy - oiy; t1y = bxy * ivy - oiy
            t0z = bnz * ivz - oiz; t1z = bxz * ivz - oiz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt))
            want = jnp.any(tn <= tf) & live
            is_leaf = cnt > 0
            do_leaf = want & is_leaf

            if mode != "noleaf":
                @pl.when(do_leaf)
                def _():
                    fst = first_r[nid]

                    def row_body(r, c):
                        row = tri_ref[pl.ds(fst + r, 1), :]
                        nbt, nbu, nbv, nbs = pk._tri_rows_test(
                            row, ox, oy, oz, dx, dy, dz,
                            bt_ref[:], bu_ref[:], bv_ref[:], bs_ref[:],
                            False)
                        bt_ref[:] = nbt
                        bu_ref[:] = nbu
                        bv_ref[:] = nbv
                        bs_ref[:] = nbs
                        return c

                    jax.lax.fori_loop(0, cnt, row_body, 0)

            nxt = jnp.where(want & ~is_leaf, nid + 1, skp)
            return jnp.where(live, nxt, node)

        if mode == "nowhile":
            # fixed trip count, no early-out
            trips = max_outer if max_outer else 16
            def body(i, node):
                return step(node)
            jax.lax.fori_loop(0, trips, body, jnp.int32(0))
        elif mode == "empty_loop":
            def outer(carry):
                node, = carry
                def body(i, nd):
                    return nd + 1
                node = jax.lax.fori_loop(0, strip, body, node)
                return (node,)
            jax.lax.while_loop(lambda c: c[0] < n_nodes, outer,
                               (jnp.int32(0),))
        else:
            def outer(carry):
                node, = carry
                def body(i, nd):
                    return step(nd)
                node = jax.lax.fori_loop(0, strip, body, node)
                return (node,)
            jax.lax.while_loop(lambda c: c[0] < n_nodes, outer,
                               (jnp.int32(0),))

    @jax.jit
    def run(*p):
        return pl.pallas_call(
            kern, grid=(n_groups,),
            in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
            out_specs=[tile()] * 5, out_shape=[out_shape] * 5,
        )(*tables, *p)

    return run


variants = {
    "full(strip8)": make_variant("full", strip=8),
    "full(strip1)": make_variant("full", strip=1),
    "noleaf": make_variant("noleaf"),
    "nowhile16": make_variant("nowhile", max_outer=16),
    "empty_loop": make_variant("empty_loop"),
    "shipped": None,
}

kernel = functools.partial(pk._packet_kernel, n_nodes=n_nodes,
                           any_hit=False)


@jax.jit
def run_shipped(*p):
    return pl.pallas_call(
        kernel, grid=(n_groups,),
        in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
        out_specs=[tile()] * 5, out_shape=[out_shape] * 5,
    )(*tables, *p)


variants["shipped"] = run_shipped

for name, fn in variants.items():
    jax.block_until_ready(fn(*packed))

mins = {name: float("inf") for name in variants}
for rnd in range(6):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*packed)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        mins[name] = min(mins[name], dt)

for name, dt in mins.items():
    print(f"{name:14s}: {dt*1e3:8.3f} ms  {dt/n_groups*1e6:7.2f} us/group  "
          f"{n/dt/1e6:7.1f} Mrays/s")

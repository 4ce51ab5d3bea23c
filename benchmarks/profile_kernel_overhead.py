"""Isolate the ~70us fixed per-group cost of the packet kernel.

Compares, on pre-packed inputs (pack/unpack outside the timer):
  a) null pallas kernel with identical I/O shapes
  b) real packet kernel
  c) the pack+unpack+Hit wrapper alone (kernel replaced by passthrough)
and sweeps PACKET sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from tpurt.bvh.cluster import build_packet_accel
    from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
    from tpurt.kernels import packet as pk
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene

    scene = load_scene("cornell")
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_packet_accel(ds, meta)
    w, h = 512, 512
    px, py = full_frame_pixels_tiled(w, h)
    org, dirn = camera_rays(scene.camera, px, py, w, h)
    n = org.shape[0]
    print(f"n rays = {n}")

    tables = tuple(
        jnp.asarray(getattr(accel, f))
        for f in ["node_bminx", "node_bminy", "node_bminz", "node_bmaxx",
                  "node_bmaxy", "node_bmaxz", "node_first", "node_count",
                  "node_skip", "tri_rows"]
    )
    n_nodes = accel.n_nodes

    for packet in [1024, 2048, 4096, 8192]:
        pk.PACKET = packet
        rows = packet // 128
        n_groups = n // packet
        padded = n_groups * packet

        def pack(a, fill):
            return pk._pack(a, padded, fill)

        packed = jax.jit(lambda o, d: (
            pack(o[:, 0], 0.0), pack(o[:, 1], 0.0), pack(o[:, 2], 0.0),
            pack(d[:, 0], 1.0), pack(d[:, 1], 1.0), pack(d[:, 2], 1.0),
            pack(jnp.full(o.shape[0], 3.4e38, jnp.float32), -1.0),
        ))(org, dirn)
        packed = jax.block_until_ready(packed)

        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)

        # a) null kernel — same I/O
        def null_kernel(*refs):
            tm = refs[-6]
            for r in refs[-5:]:
                r[:] = tm[:]

        @jax.jit
        def run_null(*p):
            return pl.pallas_call(
                null_kernel,
                grid=(n_groups,),
                in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
                out_specs=[tile()] * 5,
                out_shape=[out_shape] * 5,
            )(*tables, *p)

        # b) real kernel
        kernel = functools.partial(
            pk._packet_kernel, n_nodes=n_nodes, any_hit=False
        )

        @jax.jit
        def run_real(*p):
            return pl.pallas_call(
                kernel,
                grid=(n_groups,),
                in_specs=[smem()] * 9 + [full()] + [tile()] * 7,
                out_specs=[tile()] * 5,
                out_shape=[out_shape] * 5,
            )(*tables, *p)

        try:
            dt_null = timeit(run_null, *packed)
        except Exception as e:
            print(f"PACKET={packet}: null failed: {str(e)[:100]}")
            dt_null = float("nan")
        dt_real = timeit(run_real, *packed)
        print(f"PACKET={packet:5d} groups={n_groups:4d}: "
              f"null={dt_null*1e3:7.3f} ms ({dt_null/n_groups*1e6:6.1f} us/g) "
              f"real={dt_real*1e3:7.3f} ms ({dt_real/n_groups*1e6:6.1f} us/g) "
              f"-> {n/dt_real/1e6:7.1f} Mrays/s")

    # c) wrapper-only cost: full _trace path but measure pack/unpack via
    # timing difference is implicit; directly time packing alone
    pk.PACKET = 2048

    @jax.jit
    def pack_only(o, d):
        padded = (n // 2048) * 2048
        return [pk._pack(o[:, i], padded, 0.0) for i in range(3)] + [
            pk._pack(d[:, i], padded, 1.0) for i in range(3)
        ]

    dt_pack = timeit(pack_only, org, dirn)
    print(f"pack-only (6 fields): {dt_pack*1e3:.3f} ms")

    # full wrapper path (as shipped)
    closest, _ = pk.make_packet_intersector(ds, accel, ray_sort="none")

    @jax.jit
    def run_full(o, d):
        return closest(o, d, 0.0, jnp.inf).t

    dt_full = timeit(run_full, org, dirn)
    print(f"full wrapper path:    {dt_full*1e3:.3f} ms "
          f"= {n/dt_full/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()

"""Per-phase timing of the pair-wavefront pipeline on the real TPU.

Separately jits cull+expand, field gather, the Pallas block kernel, and
the scatter reduce, to find where sweep_pair's 4.3 s/trace goes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.bvh.paircluster import build_pair_accel
from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
from tpurt.kernels import pairwave as pw
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device
from tpurt.utils.config import get_config


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    cfg = get_config("bunny", width=800, height=600)
    scene = load_scene(cfg.scene)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    C = accel.n_clusters
    accel = jax.device_put(accel)

    w, h = cfg.width, cfg.height
    px, py = full_frame_pixels_tiled(w, h)
    org_np, dir_np = camera_rays(scene.camera, np.asarray(px),
                                 np.asarray(py), w, h)
    org = jax.device_put(jnp.asarray(np.asarray(org_np)))
    dirn = jax.device_put(jnp.asarray(np.asarray(dir_np)))
    n = org.shape[0]
    tmax = jnp.full((n,), pw.BIG, jnp.float32)
    cap = -(-(n * 8) // pw.BLOCK) * pw.BLOCK

    results = {}

    @jax.jit
    def phase_a(acc, org, dirn, tmax):
        return pw._cull_expand(org, dirn, tmax, acc.cluster_lo,
                               acc.cluster_hi, n_clusters=C, pair_cap=cap)

    dt, a_out = timeit(phase_a, accel, org, dirn, tmax)
    results["A_cull_expand"] = dt
    pair_ray, pair_cluster, bcmin, bcmax, n_pairs, ovf = a_out

    p = pair_ray.shape[0]
    n_blocks = p // pw.BLOCK

    @jax.jit
    def phase_b(org, dirn, tmax, pair_ray, pair_cluster):
        safe = jnp.clip(pair_ray, 0, n - 1)
        dead = pair_ray < 0

        def field(a, fill):
            v = jnp.where(dead, fill, a[safe])
            return v.reshape(n_blocks * 8, 128)

        return (field(org[:, 0], 0.0), field(org[:, 1], 0.0),
                field(org[:, 2], 0.0), field(dirn[:, 0], 1.0),
                field(dirn[:, 1], 1.0), field(dirn[:, 2], 1.0),
                field(tmax, -1.0),
                jnp.where(dead, -1.0,
                          pair_cluster.astype(jnp.float32)).reshape(
                              n_blocks * 8, 128))

    dt, fields = timeit(phase_b, org, dirn, tmax, pair_ray, pair_cluster)
    results["B_gather"] = dt

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = lambda: pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [tile()] * 8,
        out_specs=[tile()] * 4,
    )

    @jax.jit
    def phase_c(acc, bcmin, bcmax, fields):
        return pl.pallas_call(
            pw._pair_kernel,
            grid_spec=grid_spec,
            out_shape=[out_shape] * 4,
        )(bcmin, bcmax, acc.tri_rows, *fields)

    dt, c_out = timeit(phase_c, accel, bcmin, bcmax, fields)
    results["C_kernel"] = dt
    bt, bu, bv, bs = c_out

    @jax.jit
    def phase_d(bt, bu, bv, bs, pair_ray):
        bt = bt.reshape(p)
        bu = bu.reshape(p)
        bv = bv.reshape(p)
        bs = bs.reshape(p)
        dead = pair_ray < 0
        ray_i = jnp.where(dead, n, pair_ray)
        hit_pair = bs >= 0.0
        t_eff = jnp.where(hit_pair, bt, pw.BIG)
        best_t = jnp.full(n + 1, pw.BIG, jnp.float32).at[ray_i].min(
            t_eff, mode="drop")[:n]
        win1 = hit_pair & (bt <= best_t[jnp.clip(pair_ray, 0, n - 1)])
        s_eff = jnp.where(win1, bs, pw.BIG)
        best_s = jnp.full(n + 1, pw.BIG, jnp.float32).at[ray_i].min(
            s_eff, mode="drop")[:n]
        win2 = win1 & (bs == best_s[jnp.clip(pair_ray, 0, n - 1)])
        zero = jnp.zeros(n + 1, jnp.float32)
        u_best = zero.at[ray_i].max(jnp.where(win2, bu, -pw.BIG),
                                    mode="drop")[:n]
        return best_t, best_s, u_best

    dt, _ = timeit(phase_d, bt, bu, bv, bs, pair_ray)
    results["D_reduce"] = dt

    # sub-phase: the dense mask alone (no nonzero/cumsum)
    @jax.jit
    def phase_a1(acc, org, dirn, tmax):
        inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12, 1e-12, dirn)
        t0 = (acc.cluster_lo[None] - org[:, None]) * inv[:, None]
        t1 = (acc.cluster_hi[None] - org[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        mask = (tn <= tf) & (tf >= 0.0)
        return mask.sum(axis=0, dtype=jnp.int32)

    dt, _ = timeit(phase_a1, accel, org, dirn, tmax)
    results["A1_mask_only"] = dt

    # sub-phase: nonzero of a same-sized mask
    mask_flat = jax.device_put(
        jnp.asarray(np.random.default_rng(0).random(C * 120_000) < 0.007))

    @jax.jit
    def phase_a2(mf):
        return jnp.nonzero(mf, size=cap // 4, fill_value=-1)[0]

    dt, _ = timeit(phase_a2, mask_flat)
    results["A2_nonzero_102M"] = dt

    print("RESULT " + json.dumps(
        {k: round(v, 4) for k, v in results.items()}), flush=True)
    print(f"blocks={n_blocks} p={p} C={C}", flush=True)


if __name__ == "__main__":
    main()

"""Exact-mask kernel optimization sweep on REAL captured bench waves.

The Pallas exact mask measured 56.8 ms per bounce-1 trace at bunny bench
scale (probe_occl_decomp) vs a ~27 ms vreg-op floor (4 chunks x 7 blocks
x ~30 ops x 32 vregs per tile). Variants measured here, all producing
bit-identical mask/tn outputs:

  base       production _exact_mask_kernel (tilewave.py)
  deadskip   @pl.when(any alive) around each ray chunk's block loop —
             dead chunks (shadow want fractions are 6-52%, truncated
             bounce tails) skip ALL dense work
  fma        t0 = lo*iv - oiv with oiv hoisted per chunk (2 fma/axis
             instead of sub+mul x2; fewer live broadcasts)
  rchN       RCH sweep (64/128/256): broadcast register pressure vs
             output-row RMW amortization

Usage (device must be free):  python benchmarks/probe_mask_v2.py
"""

import functools
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPDIR = "/tmp/tpurt_waves"


def make_kernel(rch, fma, deadskip):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from tpurt.kernels.tilewave import BIG, TILE

    def kern(ray_ref, box_ref, mask_ref, tn_ref, *, n_blocks, group):
        for g in range(group):
            for b in range(n_blocks):
                sl = pl.ds(b * 128, 128)
                mask_ref[g:g + 1, sl] = jnp.zeros((1, 128), jnp.float32)
                tn_ref[g:g + 1, sl] = jnp.full((1, 128), BIG,
                                               jnp.float32)
            for rc in range(TILE // rch):
                rows = pl.ds(g * TILE + rc * rch, rch)
                o = [ray_ref[rows, a:a + 1] for a in range(3)]
                iv = [ray_ref[rows, 3 + a:4 + a] for a in range(3)]
                tm = ray_ref[rows, 6:7]
                alive = tm >= 0.0
                tf0 = jnp.maximum(tm, 0.0)
                if fma:
                    oiv = [o[a] * iv[a] for a in range(3)]

                def blocks():
                    for b in range(n_blocks):
                        sl = pl.ds(b * 128, 128)
                        tn = jnp.zeros((rch, 128), jnp.float32)
                        tf = jnp.broadcast_to(tf0, (rch, 128))
                        for a in range(3):
                            lo_a = box_ref[a:a + 1, sl]
                            hi_a = box_ref[3 + a:4 + a, sl]
                            if fma:
                                t0 = lo_a * iv[a] - oiv[a]
                                t1 = hi_a * iv[a] - oiv[a]
                            else:
                                t0 = (lo_a - o[a]) * iv[a]
                                t1 = (hi_a - o[a]) * iv[a]
                            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                        hit = (tn <= tf) & alive
                        mask_ref[g:g + 1, sl] = jnp.maximum(
                            mask_ref[g:g + 1, sl],
                            jnp.any(hit, axis=0, keepdims=True
                                    ).astype(jnp.float32),
                        )
                        tn_ref[g:g + 1, sl] = jnp.minimum(
                            tn_ref[g:g + 1, sl],
                            jnp.min(jnp.where(hit, tn, BIG), axis=0,
                                    keepdims=True),
                        )

                if deadskip:
                    @pl.when(jnp.any(alive))
                    def _():
                        blocks()
                else:
                    blocks()

    return kern


def make_fn(variant, lo, hi, C):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpurt.kernels import tilewave as tw

    rch = variant.get("rch", 256)
    kern = make_kernel(rch, variant.get("fma", False),
                       variant.get("deadskip", False))

    def run(org, dirn, tmv):
        n = org.shape[0]
        n_tiles = n // tw.TILE
        cp = ((C + 127) // 128) * 128
        group = 8
        tp = ((n_tiles + group - 1) // group) * group
        inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                              jnp.where(dirn >= 0.0, 1e-12, -1e-12),
                              dirn)
        ray_pack = jnp.concatenate(
            [org, inv, tmv[:, None], jnp.zeros((n, 1), jnp.float32)],
            axis=1)
        if tp != n_tiles:
            pad = jnp.zeros(((tp - n_tiles) * tw.TILE, 8), jnp.float32)
            pad = pad.at[:, 6].set(-1.0)
            ray_pack = jnp.concatenate([ray_pack, pad])
        boxes = jnp.full((8, cp), tw.BIG, jnp.float32)
        boxes = boxes.at[3:6, :].set(-tw.BIG)
        boxes = boxes.at[0:3, :C].set(lo.T)
        boxes = boxes.at[3:6, :C].set(hi.T)
        mask_f, tn = pl.pallas_call(
            functools.partial(kern, n_blocks=cp // 128, group=group),
            grid=(tp // group,),
            in_specs=[
                pl.BlockSpec((group * tw.TILE, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((group, cp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, cp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((tp, cp), jnp.float32),
                jax.ShapeDtypeStruct((tp, cp), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(ray_pack, boxes)
        return mask_f[:n_tiles, :C] > 0.5, tn[:n_tiles, :C]

    return jax.jit(run)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt.kernels import tilewave as tw
    from tpurt.render import build_accel
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene
    from tpurt.utils.config import get_config

    config = get_config("bunny", spp=8, spp_per_batch=8)
    scene = load_scene(config.scene)
    ds = to_device(scene)
    meta = scene_meta(scene)
    accel = build_accel(config, ds, meta, scene=scene)
    lo = jnp.asarray(accel.cluster_lo)
    hi = jnp.asarray(accel.cluster_hi)
    C = int(lo.shape[0])
    scene_lo = jnp.min(lo, axis=0)
    scene_hi = jnp.max(hi, axis=0)

    waves = {}
    for f in sorted(glob.glob(CAPDIR + "/*.npz")):
        waves[os.path.basename(f)[:-len("_wave.npz")]] = dict(np.load(f))
    if not waves:
        print("no captured waves — run probe_occl_decomp.py --capture")
        return 1

    def prep(w, shadow, sort):
        org = jnp.asarray(w["org"])
        dirn = jnp.asarray(w["dirn"])
        n = org.shape[0]
        if shadow:
            tmv = jnp.asarray(w["tmax"])
            tmv = jnp.where(jnp.asarray(w["want"]), tmv, -1.0)
        else:
            tmv = jnp.where(jnp.asarray(w["alive"]), tw.BIG, -1.0)
        pad = (-n) % tw.TILE
        if pad:
            org = jnp.concatenate([org, jnp.zeros((pad, 3),
                                                  jnp.float32)])
            dirn = jnp.concatenate([dirn, jnp.ones((pad, 3),
                                                   jnp.float32)])
            tmv = jnp.concatenate([tmv, jnp.full(pad, -1.0,
                                                 jnp.float32)])
        if sort:
            keys = tw._octant_sort_keys(org, dirn, tmv, scene_lo,
                                        scene_hi)
            _, ox, oy, oz, dx, dy, dz, tm = jax.lax.sort(
                (keys, org[:, 0], org[:, 1], org[:, 2], dirn[:, 0],
                 dirn[:, 1], dirn[:, 2], tmv), num_keys=1)
            org = jnp.stack([ox, oy, oz], axis=1)
            dirn = jnp.stack([dx, dy, dz], axis=1)
            tmv = tm
        return (jax.device_put(org), jax.device_put(dirn),
                jax.device_put(tmv))

    cases = {
        "bounce1(sorted)": prep(waves["bounce1"], False, True),
        "shadow1(unsorted)": prep(waves["shadow1"], True, False),
    }
    for v in cases.values():
        jax.block_until_ready(v)

    variants = [
        ("base", {}),
        ("deadskip", {"deadskip": True}),
        ("fma", {"fma": True}),
        ("fma+skip", {"fma": True, "deadskip": True}),
        ("rch128", {"rch": 128}),
        ("rch128+fma+skip", {"rch": 128, "fma": True,
                             "deadskip": True}),
        ("rch64+fma+skip", {"rch": 64, "fma": True, "deadskip": True}),
        ("rch512+fma+skip", {"rch": 512, "fma": True,
                             "deadskip": True}),
    ]
    ref_out = {}
    for name, spec in variants:
        fn = make_fn(spec, np.asarray(lo), np.asarray(hi), C)
        for cname, (org, dirn, tmv) in cases.items():
            try:
                m, tn = jax.block_until_ready(fn(org, dirn, tmv))
            except Exception as e:
                print(f"{name:18s} {cname:18s} FAILED: "
                      f"{str(e)[:120]}", flush=True)
                continue
            t0 = time.perf_counter()
            for _ in range(8):
                m, tn = fn(org, dirn, tmv)
            jax.block_until_ready((m, tn))
            ms = (time.perf_counter() - t0) / 8 * 1e3
            if name == "base":
                ref_out[cname] = (np.asarray(m), np.asarray(tn))
                match = "ref"
            else:
                rm, rtn = ref_out[cname]
                match = ("exact" if (np.asarray(m) == rm).all()
                         and np.allclose(np.asarray(tn), rtn)
                         else "MISMATCH")
            print(f"{name:18s} {cname:18s} {ms:8.2f} ms  [{match}]",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""CPU probe: pair count vs tile size and sort key on a REAL bounce wave.

The tile kernel's work is ~proportional to the number of active
(tile, cluster) pairs. This probe renders one bunny bounce on CPU to get
a realistic incoherent wave, then measures total pairs (= sum of the
conservative interval-frustum mask) for candidate ray orderings and tile
sizes — predicting kernel time without any TPU compile.

Run: JAX_PLATFORMS=cpu python benchmarks/probe_tile_union.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tpurt.bvh.paircluster import build_pair_accel
from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.bvh.two_level import build_scene_accel, make_two_level_intersector
from tpurt.scene.device import to_device
from tpurt.utils.config import get_config
from tpurt.kernels import tilewave as tw


def bounce_wave(scene, ds, meta, n_max=262144):
    """Primary hits -> cosine-hemisphere bounce directions (numpy)."""
    w, h = 800, 600
    px, py = full_frame_pixels_tiled(w, h)
    org, dirn = camera_rays(scene.camera, np.asarray(px), np.asarray(py),
                            w, h)
    org = np.asarray(org)[:n_max]
    dirn = np.asarray(dirn)[:n_max]
    # oracle closest hit (jnp two-level BVH on CPU)
    accel = build_scene_accel(ds, meta)
    closest, _ = make_two_level_intersector(ds, accel)
    hit = closest(jnp.asarray(org), jnp.asarray(dirn), 0.0, jnp.inf)
    valid = np.asarray(hit.valid)
    t = np.asarray(hit.t)
    p = org + t[:, None] * dirn
    # geometric normal via the hit triangle
    rng = np.random.default_rng(0)
    u1 = rng.random(org.shape[0]).astype(np.float32)
    u2 = rng.random(org.shape[0]).astype(np.float32)
    # cosine hemisphere around +z then align to normal-ish (use -dirn
    # reflection hemisphere as a stand-in: realistic spread)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    local = np.stack(
        [r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)], axis=1
    )
    nrm = -dirn  # conservative stand-in normal
    tang = np.cross(nrm, np.roll(nrm, 1, axis=1))
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bita = np.cross(nrm, tang)
    wd = (local[:, 0:1] * tang + local[:, 1:2] * bita
          + local[:, 2:3] * nrm).astype(np.float32)
    wd /= np.maximum(np.linalg.norm(wd, axis=1, keepdims=True), 1e-9)
    org_b = (p + 1e-3 * wd).astype(np.float32)
    tmax = np.where(valid, np.float32(3e38), np.float32(-1.0))
    return org_b, wd, tmax, valid.mean()


KEYS = {
    "none": None,
    "morton_o": "morton",
    "octant": "octant",
}


def finer_key(org, dirn, tmv, scene_lo, scene_hi, dir_bits):
    """Direction-morton-major (dir_bits per axis incl. sign), origin
    morton minor."""
    ext = np.maximum(scene_hi - scene_lo, 1e-12)
    q = np.clip((org - scene_lo) / ext, 0.0, 1.0)
    g = np.minimum((q * 64).astype(np.uint64), 63)

    def expand3(x, bits):
        out = np.zeros_like(x)
        for b in range(bits):
            out |= ((x >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b)
        return out

    morton_o = (
        (expand3(g[:, 0], 6) << np.uint64(2))
        | (expand3(g[:, 1], 6) << np.uint64(1))
        | expand3(g[:, 2], 6)
    )  # 18 bits
    dq = np.clip(((dirn * 0.5 + 0.5) * (1 << dir_bits)).astype(np.uint64),
                 0, (1 << dir_bits) - 1)
    morton_d = (
        (expand3(dq[:, 0], dir_bits) << np.uint64(2))
        | (expand3(dq[:, 1], dir_bits) << np.uint64(1))
        | expand3(dq[:, 2], dir_bits)
    )
    key = (morton_d << np.uint64(18)) | morton_o
    return np.where(tmv < 0, np.uint64(2 ** 63), key)


def count_pairs(org, dirn, tmv, lo, hi, tile):
    n = org.shape[0]
    pad = (-n) % tile
    if pad:
        org = np.concatenate([org, np.zeros((pad, 3), np.float32)])
        dirn = np.concatenate([dirn, np.ones((pad, 3), np.float32)])
        tmv = np.concatenate([tmv, np.full(pad, -1, np.float32)])
    n_tiles = (n + pad) // tile
    old = tw.TILE, tw.SUB
    try:
        tw.TILE, tw.SUB = tile, tile // 128
        mask = np.asarray(tw._tile_mask(
            jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
            jnp.asarray(lo), jnp.asarray(hi), n_tiles,
        ))
    finally:
        tw.TILE, tw.SUB = old
    per_tile = mask.sum(axis=1)
    alive = (tmv.reshape(n_tiles, tile) >= 0).sum(axis=1)
    total = int(per_tile.sum())
    return total, float(per_tile.mean()), float(
        (per_tile * tile / np.maximum(alive, 1)).mean()
    )


def main():
    cfg = get_config("bunny")
    scene = load_scene(cfg.scene)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = build_pair_accel(ds, meta, scene=scene)
    lo = np.asarray(accel.cluster_lo)
    hi = np.asarray(accel.cluster_hi)
    scene_lo, scene_hi = lo.min(axis=0), hi.max(axis=0)

    org, dirn, tmv, frac = bounce_wave(scene, ds, meta)
    print(f"bounce wave: {org.shape[0]} rays, {frac*100:.1f}% alive, "
          f"{lo.shape[0]} clusters")

    orders = {}
    okey = np.asarray(tw._octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(scene_lo), jnp.asarray(scene_hi)))
    orders["octant(current)"] = np.argsort(okey, kind="stable")
    mkey = np.asarray(tw._ray_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(scene_lo), jnp.asarray(scene_hi)))
    orders["morton_o"] = np.argsort(mkey, kind="stable")
    for db in (2, 3):
        fk = finer_key(org, dirn, tmv, scene_lo, scene_hi, db)
        orders[f"dir_morton{db}"] = np.argsort(fk, kind="stable")

    for name, perm in orders.items():
        o, d, tm = org[perm], dirn[perm], tmv[perm]
        for tile in (1024, 512, 256):
            total, ppt, ppr = count_pairs(o, d, tm, lo, hi, tile)
            print(f"{name:18s} tile={tile:5d}: total {total:8d} pairs, "
                  f"{ppt:7.1f}/tile, {ppr:7.1f} clusters/alive-ray-x1k")


if __name__ == "__main__":
    main()

"""CPU probe: ray-sort key layouts vs per-tile frustum/exact pair counts.

The production octant key (kernels/tilewave.py::_octant_sort_keys) is
direction-SIGN-major (3 bits) + origin-Morton (18 bits). Within an
octant, a tile mixes every direction of that cone, so the interval
frustum's inverse-direction spread stays wide: bunny bounce wave
measures 296 frustum pairs/tile vs 96 exact — each of the ~200
frustum-only pairs costs pair machinery + an exact pre-test in the
kernel (~190 ns) before dying. Direction-REFINED keys (quantized
direction Morton between the sign bits and the origin bits) trade
origin locality for direction coherence; this probe sweeps the split.

Run: JAX_PLATFORMS=cpu python benchmarks/probe_sortkey.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from probe_cluster import kd_chop_clusters, cluster_boxes
from probe_tile_union import bounce_wave
from tpurt.bvh.cluster import _morton
from tpurt.bvh.paircluster import flatten_world_tris, kd_cluster_order
from tpurt.kernels import tilewave as tw
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device

TILE = 1024


def _expand2(x, bits):
    """Interleave 2D: x,y in [0, 2^bits) -> morton."""
    out = np.zeros_like(x, dtype=np.uint32)
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b + 1)
        out |= ((np.zeros_like(x)) & 1)  # placeholder
    return out


def _morton3(q, bits):
    g = np.clip((q * (1 << bits)).astype(np.uint32), 0, (1 << bits) - 1)
    out = np.zeros(q.shape[0], np.uint64)
    for b in range(bits):
        for a in range(3):
            out |= np.uint64(((g[:, a] >> b) & 1).astype(np.uint64)) << \
                np.uint64(3 * b + (2 - a))
    return out


def make_key(org, dirn, tmv, slo, shi, dir_bits, org_bits):
    """octant(3) | dir-morton(3*dir_bits) | origin-morton(3*org_bits)."""
    ext = np.maximum(shi - slo, 1e-12)
    qo = np.clip((org - slo) / ext, 0.0, 1.0)
    mo = _morton3(qo, org_bits)
    octant = (
        (dirn[:, 0] >= 0).astype(np.uint64)
        | ((dirn[:, 1] >= 0).astype(np.uint64) << np.uint64(1))
        | ((dirn[:, 2] >= 0).astype(np.uint64) << np.uint64(2))
    )
    key = octant
    if dir_bits:
        ad = np.abs(dirn)
        md = _morton3(ad / np.maximum(
            np.linalg.norm(dirn, axis=1, keepdims=True), 1e-12),
            dir_bits)
        key = (key << np.uint64(3 * dir_bits)) | md
    key = (key << np.uint64(3 * org_bits)) | mo
    dead = tmv < 0
    key = np.where(dead, np.uint64(0xFFFFFFFFFFFFFFFF), key)
    return key


def measure_order(name, order, org, dirn, tmv, lo, hi):
    import jax.numpy as jnp

    org, dirn, tmv = org[order], dirn[order], tmv[order]
    n_tiles = org.shape[0] // TILE
    mask = np.asarray(tw._tile_mask(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(lo), jnp.asarray(hi), n_tiles))
    frustum = mask.sum(1).mean()
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn >= 0, 1e-12, -1e-12), dirn)
    C = lo.shape[0]
    ex = np.zeros(n_tiles)
    for ti in range(n_tiles):
        s = ti * TILE
        oc = org[s:s + TILE, None]
        ic = inv[s:s + TILE, None]
        alive = (tmv[s:s + TILE] >= 0)[:, None]
        t0 = (lo[None] - oc) * ic
        t1 = (hi[None] - oc) * ic
        tn = np.max(np.minimum(t0, t1), axis=-1)
        tf = np.min(np.maximum(t0, t1), axis=-1)
        ex[ti] = ((tn <= tf) & (tf >= 0) & alive).any(0).sum()
    print(f"{name:26s} frustum/tile {frustum:7.1f} "
          f"exact-ANY/tile {ex.mean():7.1f}", flush=True)


def main():
    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    v0, v1, v2, _, _ = flatten_world_tris(ds, meta, scene)
    org, dirn, tmv, frac = bounce_wave(scene, ds, meta)
    print(f"wave: {org.shape[0]} rays ({100 * frac:.0f}% alive), "
          f"{v0.shape[0]} tris", flush=True)
    o = kd_cluster_order(v0, v1, v2, sah=True)
    groups = [o[s:s + 96] for s in range(0, len(o), 96)]
    lo, hi = cluster_boxes(groups, v0, v1, v2)
    slo, shi = lo.min(0), hi.max(0)

    import jax.numpy as jnp
    prod = np.asarray(tw._octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(slo), jnp.asarray(shi)))
    measure_order("octant+origin18 (prod)", np.argsort(prod, kind="stable"),
                  org, dirn, tmv, lo, hi)
    for db, ob in [(2, 6), (3, 6), (4, 6), (3, 4), (5, 5), (2, 4),
                   (0, 6)]:
        key = make_key(org, dirn, tmv, slo, shi, db, ob)
        measure_order(f"oct+dir{3*db}b+org{3*ob}b",
                      np.argsort(key, kind="stable"),
                      org, dirn, tmv, lo, hi)


if __name__ == "__main__":
    main()


def make_key_suffix(org, dirn, tmv, slo, shi, org_bits, dir_bits):
    """octant | origin-morton | dir-morton (dir refines within cell)."""
    ext = np.maximum(shi - slo, 1e-12)
    qo = np.clip((org - slo) / ext, 0.0, 1.0)
    mo = _morton3(qo, org_bits)
    octant = (
        (dirn[:, 0] >= 0).astype(np.uint64)
        | ((dirn[:, 1] >= 0).astype(np.uint64) << np.uint64(1))
        | ((dirn[:, 2] >= 0).astype(np.uint64) << np.uint64(2))
    )
    ad = np.abs(dirn) / np.maximum(
        np.linalg.norm(dirn, axis=1, keepdims=True), 1e-12)
    md = _morton3(ad, dir_bits)
    key = (((octant << np.uint64(3 * org_bits)) | mo)
           << np.uint64(3 * dir_bits)) | md
    return np.where(tmv < 0, np.uint64(0xFFFFFFFFFFFFFFFF), key)


def make_key_6d(org, dirn, tmv, slo, shi, bits):
    """octant | 6D-interleaved (org, dir) morton."""
    ext = np.maximum(shi - slo, 1e-12)
    qo = np.clip((org - slo) / ext, 0.0, 1.0)
    go = np.clip((qo * (1 << bits)).astype(np.uint32), 0,
                 (1 << bits) - 1)
    ad = np.abs(dirn) / np.maximum(
        np.linalg.norm(dirn, axis=1, keepdims=True), 1e-12)
    gd = np.clip((ad * (1 << bits)).astype(np.uint32), 0,
                 (1 << bits) - 1)
    key = np.zeros(org.shape[0], np.uint64)
    for b in range(bits):
        for a in range(3):
            key |= np.uint64(((go[:, a] >> b) & 1).astype(np.uint64)) \
                << np.uint64(6 * b + 2 * (2 - a) + 1)
            key |= np.uint64(((gd[:, a] >> b) & 1).astype(np.uint64)) \
                << np.uint64(6 * b + 2 * (2 - a))
    octant = (
        (dirn[:, 0] >= 0).astype(np.uint64)
        | ((dirn[:, 1] >= 0).astype(np.uint64) << np.uint64(1))
        | ((dirn[:, 2] >= 0).astype(np.uint64) << np.uint64(2))
    )
    key = (octant << np.uint64(6 * bits)) | key
    return np.where(tmv < 0, np.uint64(0xFFFFFFFFFFFFFFFF), key)


def main2():
    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    v0, v1, v2, _, _ = flatten_world_tris(ds, meta, scene)
    org, dirn, tmv, frac = bounce_wave(scene, ds, meta)
    o = kd_cluster_order(v0, v1, v2, sah=True)
    groups = [o[s:s + 96] for s in range(0, len(o), 96)]
    lo, hi = cluster_boxes(groups, v0, v1, v2)
    slo, shi = lo.min(0), hi.max(0)
    for ob, db in [(6, 4), (6, 8), (8, 6)]:
        key = make_key_suffix(org, dirn, tmv, slo, shi, ob, db)
        measure_order(f"oct+org{3*ob}b+dirsuf{3*db}b",
                      np.argsort(key, kind="stable"),
                      org, dirn, tmv, lo, hi)
    for bits in (6, 8):
        key = make_key_6d(org, dirn, tmv, slo, shi, bits)
        measure_order(f"oct+6dmorton{bits}",
                      np.argsort(key, kind="stable"),
                      org, dirn, tmv, lo, hi)


def main3():
    """Half-tile (512-ray) interval masks OR'd to one 1024-ray tile mask:
    frustum count with the production order, kernel untouched."""
    import jax.numpy as jnp

    scene = load_scene("bunny")
    ds = to_device(scene)
    meta = scene_meta(scene)
    v0, v1, v2, _, _ = flatten_world_tris(ds, meta, scene)
    org, dirn, tmv, frac = bounce_wave(scene, ds, meta)
    o = kd_cluster_order(v0, v1, v2, sah=True)
    groups = [o[s:s + 96] for s in range(0, len(o), 96)]
    lo, hi = cluster_boxes(groups, v0, v1, v2)
    slo, shi = lo.min(0), hi.max(0)
    prod = np.asarray(tw._octant_sort_keys(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
        jnp.asarray(slo), jnp.asarray(shi)))
    order = np.argsort(prod, kind="stable")
    org, dirn, tmv = org[order], dirn[order], tmv[order]
    n_tiles = org.shape[0] // 1024
    for sub in (1, 2, 4, 8):
        saved = tw.TILE
        try:
            tw.TILE = 1024 // sub
            m = np.asarray(tw._tile_mask(
                jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(tmv),
                jnp.asarray(lo), jnp.asarray(hi), n_tiles * sub))
        finally:
            tw.TILE = saved
        m = m.reshape(n_tiles, sub, -1).any(1)
        print(f"sub-frustums x{sub}: frustum/tile {m.sum(1).mean():7.1f}",
              flush=True)

"""Probe: MXU (Woop-transform) ray x triangle intersection kernel cost.

The production pair kernel (tpurt/kernels/tilewave.py) is extract-bound:
each 12-tri row test pays ~108 packed-field lane extracts (~2 cycles
each — PARITY.md law 4). This probe measures the alternative: represent
every triangle by its unit-triangle (Woop) affine transform (12 floats:
B = [E1 E2 n]^-1, c = -B v0), so a whole cluster's intersection becomes

    rays (R, 8) [ox oy oz 1 dx dy dz 0]  @  planes (8, 6C)  ->  (R, 6C)
    t = -o'z / d'z ; u = o'x + t d'x ; v = o'y + t d'y      (elementwise)
    winner = min-reduce over C                              (lane reduce)

i.e. MXU work + vector elementwise, ZERO scalar extracts. Reports
per-pair and per-ray-triangle cost for R in {128, 256, 1024} against the
current kernel's measured ~2.3 us / (1024-ray x 192-tri) pair.

Correctness is checked against a numpy Moller oracle on one pair.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRIS = 192  # triangles per cluster (tilewave ROWS_PER_CLUSTER * 12)
CPAD = 256  # lane-padded triangle count per cluster


def woop_planes(tri):
    """(T, 3, 3) triangle vertices -> (8, 6*CPAD) plane matrix.

    Column layout: [o'x | o'y | o'z | d'x | d'y | d'z] blocks of CPAD.
    Rows: [ox oy oz 1 dx dy dz 0] coefficients. Degenerate tris get
    all-zero planes (d'z = 0 -> t invalid)."""
    t = np.asarray(tri, np.float64)
    v0, e1, e2 = t[:, 0], t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]
    n = np.cross(e1, e2)
    M = np.stack([e1, e2, n], axis=-1)  # (T, 3, 3) columns e1,e2,n
    ok = np.abs(np.linalg.det(M)) > 1e-18
    B = np.zeros_like(M)
    B[ok] = np.linalg.inv(M[ok])  # (T, 3, 3)
    c = -np.einsum("tij,tj->ti", B, v0)  # (T, 3)
    T = t.shape[0]
    out = np.zeros((8, 6 * CPAD), np.float32)
    for comp in range(3):  # o'_comp block then d'_comp block
        out[0:3, comp * CPAD:comp * CPAD + T] = B[:, comp, :].T
        out[3, comp * CPAD:comp * CPAD + T] = c[:, comp]
        out[4:7, (3 + comp) * CPAD:(3 + comp) * CPAD + T] = B[:, comp, :].T
    return out


def _woop_kernel(planes_ref, rays_ref, out_ref, *, R):
    prj = jax.lax.dot_general(
        rays_ref[...], planes_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, 6*CPAD)
    opx = prj[:, 0 * CPAD:1 * CPAD]
    opy = prj[:, 1 * CPAD:2 * CPAD]
    opz = prj[:, 2 * CPAD:3 * CPAD]
    dpx = prj[:, 3 * CPAD:4 * CPAD]
    dpy = prj[:, 4 * CPAD:5 * CPAD]
    dpz = prj[:, 5 * CPAD:6 * CPAD]
    inv = 1.0 / jnp.where(jnp.abs(dpz) < 1e-18, 1e-18, dpz)
    t = -opz * inv
    u = opx + t * dpx
    v = opy + t * dpy
    hit = (
        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > 1e-4) & (jnp.abs(dpz) >= 1e-18)
    )
    tbig = jnp.where(hit, t, 3.0e38)
    best = jnp.min(tbig, axis=1, keepdims=True)  # (R, 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (R, CPAD), 1)
    bslot = jnp.min(
        jnp.where(tbig <= best, slot, 2 ** 30), axis=1, keepdims=True
    )
    out_ref[:, 0:1] = best
    out_ref[:, 1:2] = bslot.astype(jnp.float32)


def run_probe(R, n_pairs, planes, rays_mat, interpret=False):
    """Grid over pairs; pair p tests ray block (p % n_tiles) against
    cluster (p % n_clusters) — shapes match production access patterns."""
    n_clusters = planes.shape[0] // 8
    n_tiles = rays_mat.shape[0] // R

    grid = (n_pairs,)
    pspec = pl.BlockSpec((8, 6 * CPAD), lambda p: (p % n_clusters, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((R, 8), lambda p: (p % n_tiles, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((R, 128), lambda p: (p % n_tiles, 0),
                         memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_woop_kernel, R=R),
        grid=grid,
        in_specs=[pspec, rspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * R, 128), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    n_clusters = 64
    tri = rng.normal(size=(n_clusters * TRIS, 3, 3)).astype(np.float32)
    planes_np = np.concatenate(
        [woop_planes(tri[i * TRIS:(i + 1) * TRIS]) for i in range(n_clusters)],
        axis=0,
    )  # (8*n_clusters, 6*CPAD)
    planes = jnp.asarray(planes_np)

    n_rays = 8192
    org = rng.normal(size=(n_rays, 3)).astype(np.float32) * 0.1
    dirn = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirn /= np.linalg.norm(dirn, axis=1, keepdims=True)
    rays_np = np.zeros((n_rays, 8), np.float32)
    rays_np[:, 0:3] = org
    rays_np[:, 3] = 1.0
    rays_np[:, 4:7] = dirn
    rays = jnp.asarray(rays_np)

    # correctness vs Moller oracle on pair (tile 0, cluster 0)
    fn = run_probe(128, 1, planes, rays, interpret=True)
    out = np.asarray(fn(planes, rays))[:128]
    t0, s0 = out[:, 0], out[:, 1].astype(np.int64)
    tt = tri[:TRIS]
    e1 = tt[:, 1] - tt[:, 0]
    e2 = tt[:, 2] - tt[:, 0]
    o = org[:128, None, :]
    d = dirn[:128, None, :]
    p = np.cross(d, e2[None])
    det = np.einsum("rtk,tk->rt", p, e1)
    inv = np.where(np.abs(det) < 1e-18, 0.0, 1.0 / det)
    tv = o - tt[None, :, 0]
    u = np.einsum("rtk,rtk->rt", tv, p) * inv
    q = np.cross(tv, e1[None])
    v = np.einsum("rtk,rtk->rt", q, np.broadcast_to(d, q.shape)) * inv
    th = np.einsum("rtk,tk->rt", q, e2) * inv
    hit = (np.abs(det) > 1e-18) & (u >= -1e-5) & (v >= -1e-5) \
        & (u + v <= 1 + 1e-5) & (th > 1e-4)
    tref = np.where(hit, th, 3.0e38).min(axis=1)
    close = np.isclose(t0, tref, rtol=2e-3, atol=1e-4) | (
        (t0 > 1e38) & (tref > 1e38))
    print(f"correctness vs oracle: {close.mean()*100:.2f}% lanes match")

    if jax.devices()[0].platform == "cpu":
        print("CPU only — skipping timing")
        return
    planes = jax.device_put(planes)
    rays = jax.device_put(rays)
    for R in (128, 256, 1024):
        n_pairs = 4096
        fn = run_probe(R, n_pairs, planes, rays)
        r = fn(planes, rays)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            r = fn(planes, rays)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        per_pair = dt / n_pairs
        per_rt = per_pair / (R * TRIS)
        print(f"R={R:5d}: {per_pair*1e6:8.3f} us/pair  "
              f"{per_rt*1e12:8.2f} ps/(ray*tri)  "
              f"[{n_pairs} pairs in {dt*1e3:.2f} ms]")


if __name__ == "__main__":
    main()

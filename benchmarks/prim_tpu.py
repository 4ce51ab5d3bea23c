"""Primitive-throughput measurements on the real TPU.

Times the XLA building blocks a pair-based (ray, cluster) wavefront
traversal would need, so the redesign is sized on data instead of guesses:

  - argsort / sort_key_val of uint32 keys at wavefront sizes
  - gather (jnp.take) of ray SoA rows by pair index
  - scatter-min into per-ray best-t
  - dense ray x cluster AABB slab tests (VPU)
  - dense ray x triangle Moller-Trumbore via f32 matmul (MXU) and VPU

No device->host transfer happens before the final result print (the first
D2H of a process poisons dispatch latency on this backend --
benchmarks/profile_poison.py).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    results = {}
    key = jax.random.PRNGKey(0)

    # --- sort -----------------------------------------------------------
    for n in (1 << 19, 1 << 21, 1 << 23):
        keys = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32)
        vals = jnp.arange(n, dtype=jnp.int32)
        f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
        dt = timeit(f, keys, vals)
        results[f"sort_kv_{n>>20 or 1}M" if n >= 1 << 20 else
                f"sort_kv_512k"] = {
            "s": dt, "melts_per_s": n / dt / 1e6}

    # --- argsort --------------------------------------------------------
    n = 1 << 21
    keys = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32)
    f = jax.jit(lambda k: jnp.argsort(k))
    results["argsort_2M"] = {"s": timeit(f, keys)}

    # --- gather ---------------------------------------------------------
    n_rays = 480_000
    rays = jax.random.normal(key, (n_rays, 8), jnp.float32)
    for n_pairs in (1 << 21, 1 << 23):
        idx = jax.random.randint(key, (n_pairs,), 0, n_rays, jnp.int32)
        f = jax.jit(lambda r, i: r[i])
        dt = timeit(f, rays, idx)
        results[f"gather8f_{n_pairs>>20}M"] = {
            "s": dt, "gbps": n_pairs * 32 / dt / 1e9}
        # transposed SoA variant: 8 separate (n,) gathers
        rays_t = rays.T
        f2 = jax.jit(lambda r, i: tuple(r[j][i] for j in range(8)))
        dt = timeit(f2, rays_t, idx)
        results[f"gather8xsoa_{n_pairs>>20}M"] = {
            "s": dt, "gbps": n_pairs * 32 / dt / 1e9}

    # --- scatter-min ----------------------------------------------------
    for n_pairs in (1 << 21, 1 << 23):
        idx = jax.random.randint(key, (n_pairs,), 0, n_rays, jnp.int32)
        t = jax.random.uniform(key, (n_pairs,), jnp.float32)
        best = jnp.full((n_rays,), jnp.inf, jnp.float32)
        f = jax.jit(lambda b, i, v: b.at[i].min(v))
        dt = timeit(f, best, idx, t)
        results[f"scatter_min_{n_pairs>>20}M"] = {
            "s": dt, "melts_per_s": n_pairs / dt / 1e6}
    # sorted-index variant
    idxs = jnp.sort(idx)
    dt = timeit(f, best, idxs, t)
    results["scatter_min_8M_sorted"] = {"s": dt,
                                        "melts_per_s": (1 << 23) / dt / 1e6}
    # segment_min alternative
    f3 = jax.jit(lambda v, i: jax.ops.segment_min(v, i, num_segments=n_rays))
    dt = timeit(f3, t, idxs)
    results["segment_min_8M_sorted"] = {"s": dt,
                                        "melts_per_s": (1 << 23) / dt / 1e6}

    # --- dense ray x cluster box test ------------------------------------
    n, c = 480_000 // 2 * 2, 512
    org = jax.random.normal(key, (n, 3), jnp.float32)
    inv = jax.random.normal(key, (n, 3), jnp.float32)
    blo = jax.random.normal(key, (c, 3), jnp.float32)
    bhi = blo + 0.5

    @jax.jit
    def boxtest(org, inv, blo, bhi):
        # (n, 1, 3) vs (1, c, 3) slab test -> (n, c) bool
        t0 = (blo[None] - org[:, None]) * inv[:, None]
        t1 = (bhi[None] - org[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return tn <= tf

    dt = timeit(boxtest, org, inv, blo, bhi)
    results["boxtest_480kx512"] = {
        "s": dt, "gpairs_per_s": n * c / dt / 1e9}

    # --- dense MT via matmul (MXU) ---------------------------------------
    # 16-dim ray features x (16, 4*T) tri coeffs -> (pairs of full blocks)
    m, t4 = 1 << 13, 512  # 8192 rays x 128 tris per block
    feats = jax.random.normal(key, (m, 16), jnp.float32)
    coef = jax.random.normal(key, (16, 4 * t4 // 4), jnp.float32)

    @jax.jit
    def mt_mxu(f, cM):
        return jnp.dot(f, cM, preferred_element_type=jnp.float32)

    dt = timeit(mt_mxu, feats, coef)
    results["mt_matmul_8kx128tri"] = {
        "s": dt, "gpairs_per_s": m * (t4 // 4) / dt / 1e9}

    # bigger block
    m2 = 1 << 15
    feats2 = jax.random.normal(key, (m2, 16), jnp.float32)
    coef2 = jax.random.normal(key, (16, 2048), jnp.float32)
    dt = timeit(mt_mxu, feats2, coef2)
    results["mt_matmul_32kx512tri"] = {
        "s": dt, "gpairs_per_s": m2 * 512 / dt / 1e9}

    # --- XLA take along pair expansion: build pair list via nonzero-----
    mask = boxtest(org[:100_352], inv[:100_352], blo, bhi)

    @jax.jit
    def pairs_from_mask(mask):
        flat = mask.ravel()
        idx = jnp.nonzero(flat, size=mask.shape[0] * 8,
                          fill_value=-1)[0]
        return idx

    dt = timeit(pairs_from_mask, mask)
    results["nonzero_100kx512_cap8"] = {"s": dt}

    print("RESULT " + json.dumps(
        {k: {kk: round(vv, 6) for kk, vv in v.items()}
         for k, v in results.items()}))


if __name__ == "__main__":
    main()

"""Probe: per-trace XLA machinery costs at BENCH scale (3.84M rays).

Round-3 finding: the bench frame is ~70% XLA machinery (sorts, exact
mask, pair expansion, slices), ~20% Pallas kernel — so machinery, not
the kernel, is the perf lever. This times each piece in isolation on
the TPU at the bunny bench shapes (N = 3.84M rays, C = 854 clusters,
T = 3750 tiles).

Run: python benchmarks/probe_trace_machinery.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 3_840_000
C = 854
TILE = 1024


def bench(name, fn, *args, iters=3):
    """block_until_ready does NOT serialize dispatch on this backend
    (PARITY law 5) — wall numbers here are indicative only; the probe
    wraps everything in jax.profiler.trace and the xplane per-program
    device times (printed by main) are the trusted numbers."""
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1e3:8.1f} ms (wall, unreliable)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    org = jnp.asarray(rng.random((N, 3), np.float32))
    dirn = jnp.asarray(rng.random((N, 3), np.float32) - 0.5)
    tmv = jnp.asarray(rng.random(N, np.float32) * 100.0)
    keys = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
    lo = jnp.asarray(rng.random((C, 3), np.float32))
    hi = lo + 0.1

    @jax.jit
    def fwd_sort(keys, org, dirn, tmv):
        n = org.shape[0]
        return jax.lax.sort(
            (keys, org[:, 0], org[:, 1], org[:, 2], dirn[:, 0],
             dirn[:, 1], dirn[:, 2], tmv,
             jnp.arange(n, dtype=jnp.int32)),
            num_keys=1,
        )

    @jax.jit
    def restore_sort(rk, a, b, c, d, e):
        return jax.lax.sort((rk, a, b, c, d, e), num_keys=1)

    @jax.jit
    def restore_sort2(rk, a):
        return jax.lax.sort((rk, a), num_keys=1)

    @jax.jit
    def exact_mask(org, dirn, tmv, lo, hi):
        from tpurt.kernels.tilewave import _exact_any_mask

        return _exact_any_mask(org, dirn, tmv, lo, hi, N // TILE,
                               return_tn=True)

    @jax.jit
    def octant_keys(org, dirn, tmv):
        from tpurt.kernels.tilewave import _octant_sort_keys

        return _octant_sort_keys(org, dirn, tmv, lo[0], hi[-1])

    @jax.jit
    def expansion(mask, tn):
        # the masked-path merge: nonzero over (T, C) + sentinel sort
        T = mask.shape[0]
        real_cap = 256 * 384
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        m = mask & (rank <= 383)
        ridx = jnp.nonzero(m.ravel(), size=real_cap, fill_value=-1)[0]
        return ridx

    rk = jnp.asarray(rng.permutation(N).astype(np.int32))
    bt = jnp.asarray(rng.random(N, np.float32))

    with jax.profiler.trace("/tmp/machprof"):
        bench("forward sort (9 ops, N=3.84M)", fwd_sort, keys, org,
              dirn, tmv)
        bench("restore sort (6 ops)", restore_sort, rk, bt, bt, bt,
              bt, bt)
        bench("restore sort (2 ops, shadow)", restore_sort2, rk, bt)
        bench("octant keys", octant_keys, org, dirn, tmv)
        bench("exact any-mask (N x C slab)", exact_mask, org, dirn,
              tmv, lo, hi)
        mask, tn = exact_mask(org, dirn, tmv, lo, hi)
        bench("expansion (nonzero+clamp)", expansion, mask, tn)
    import glob
    import subprocess

    pb = sorted(glob.glob("/tmp/machprof/plugins/profile/*/*.xplane.pb"))[-1]
    print("\n== xplane device times (trusted; 4 runs each incl compile-check)")
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "xplane_summary.py"), pb, "12"])


if __name__ == "__main__":
    main()

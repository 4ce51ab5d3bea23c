"""Primitive throughputs on the real TPU, chained-execution edition.

benchmarks/prim_tpu.py timed independent dispatches and produced
impossible numbers (246M box tests in 26us = 50x VPU peak): on the
tunneled axon backend, block_until_ready does not serialize a burst of
independent dispatches. Here every repetition CONSUMES the previous
result inside one jitted lax.fori_loop, so iterations execute serially;
wall time / iters is honest. A known-FLOPs matmul calibrates the harness.
"""
import json
import time

import jax
import jax.numpy as jnp


def chain_time(make_body, init, iters=16, reps=3):
    """Time one iteration of body (carry -> carry), chained inside jit."""

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, iters, lambda i, c: make_body(c), c)

    out = run(init)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


class _Results(dict):
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        print(f"  {k}: {json.dumps({kk: round(vv, 6) for kk, vv in v.items()})}",
              flush=True)


def main():
    results = _Results()
    key = jax.random.PRNGKey(0)

    # --- calibration: 4096^3 f32 matmul = 137 GFLOP/iter ---------------
    a = jax.random.normal(key, (4096, 4096), jnp.float32)

    def mm_body(c):
        return jnp.dot(c, a, preferred_element_type=jnp.float32) * 1e-3

    dt = chain_time(mm_body, a, iters=8)
    results["matmul_4096_f32"] = {
        "s": dt, "tflops": 2 * 4096**3 / dt / 1e12}

    ab = a.astype(jnp.bfloat16)

    def mmb_body(c):
        return (jnp.dot(c, ab, preferred_element_type=jnp.float32)
                * 1e-3).astype(jnp.bfloat16)

    dt = chain_time(mmb_body, ab, iters=8)
    results["matmul_4096_bf16"] = {
        "s": dt, "tflops": 2 * 4096**3 / dt / 1e12}

    # --- sort_key_val ----------------------------------------------------
    n = 1 << 21
    keys0 = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32)

    def sort_body(c):
        k, v = jax.lax.sort_key_val(c[0], c[1])
        return (k ^ v, v)  # consume, change keys each iter

    dt = chain_time(sort_body, (keys0, jnp.arange(n, dtype=jnp.int32)),
                    iters=8)
    results["sort_kv_2M"] = {"s": dt, "melts_per_s": n / dt / 1e6}

    # --- gather: 2M pair rows from 480k-ray SoA -------------------------
    n_rays = 480_000
    rays = jax.random.normal(key, (n_rays, 8), jnp.float32)
    idx0 = jax.random.randint(key, (1 << 21,), 0, n_rays, jnp.int32)

    def gather_body(c):
        g = rays[c]  # (2M, 8)
        return (c + g[:, 0].astype(jnp.int32)) % n_rays

    dt = chain_time(gather_body, idx0, iters=8)
    results["gather8f_2M"] = {"s": dt,
                              "gbps": (1 << 21) * 32 / dt / 1e9}

    # --- scatter-min: 2M sorted-index updates into 480k ------------------
    tvals = jax.random.uniform(key, (1 << 21,), jnp.float32)
    idxs = jnp.sort(idx0)

    def scatter_body(c):
        b = jnp.full((n_rays,), jnp.inf, jnp.float32).at[idxs].min(
            tvals + c[0]
        )
        return b

    dt = chain_time(scatter_body, jnp.zeros(n_rays), iters=8)
    results["scatter_min_2M_sorted"] = {
        "s": dt, "melts_per_s": (1 << 21) / dt / 1e6}

    # --- dense boxtest 480k x 512 ----------------------------------------
    org = jax.random.normal(key, (n_rays, 3), jnp.float32)
    inv = jax.random.normal(key, (n_rays, 3), jnp.float32)
    blo = jax.random.normal(key, (512, 3), jnp.float32)
    bhi = blo + 0.5

    def box_body(c):
        o = org + c  # (n, 3), carry-dependent
        t0 = (blo[None] - o[:, None]) * inv[:, None]
        t1 = (bhi[None] - o[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hits = (tn <= tf).sum().astype(jnp.float32)
        return c + hits * 1e-30

    dt = chain_time(box_body, jnp.float32(0), iters=4)
    results["boxtest_480kx512"] = {
        "s": dt, "gpairs_per_s": n_rays * 512 / dt / 1e9}

    # --- nonzero (pair expansion) over 100k x 512 mask -------------------
    mask0 = jax.random.bernoulli(key, 0.01, (100_352 * 512,))

    def nz_body(c):
        idx = jnp.nonzero(jnp.roll(mask0, c[0]), size=100_352 * 8,
                          fill_value=-1)[0]
        return (idx[0] % 7 + 1,)

    dt = chain_time(nz_body, (jnp.int32(1),), iters=4)
    results["nonzero_51M_cap800k"] = {"s": dt}

    # --- cumsum over 51M bools (the nonzero building block) --------------
    def cs_body(c):
        s = jnp.cumsum(mask0.astype(jnp.int32) + c)
        return s[-1] % 3

    dt = chain_time(cs_body, jnp.int32(0), iters=4)
    results["cumsum_51M"] = {"s": dt}

    print("RESULT " + json.dumps(
        {k: {kk: round(vv, 6) for kk, vv in v.items()}
         for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()

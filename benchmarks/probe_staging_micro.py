"""The three gate measurements for per-ray cluster-dense staging
(docs/DESIGN_perray_staging.md "round-3 entry point"):

  (a) grid-step machinery amortization: ns/step for a near-empty kernel
      vs one doing B simulated placement units of VPU work per step —
      the design is dead unless amortized cost per passing (lane-row,
      cluster) pair lands under ~60 ns.
  (b) dynamic-offset HBM append: an SMEM cursor scratch persisting
      across sequential grid steps driving `pltpu.make_async_copy` of a
      (128, 8) block into an un-blocked (MemorySpace.ANY) output at
      `pl.ds(cursor, 128)` — does Mosaic accept it, and what does one
      append cost? Interpret mode first (CPU) checks the semantics.
  (c) one-hot placement throughput: lane-cumsum via triangular MXU
      matmul + per-row one-hot build + (128, 128) @ (128, 8) placement
      matmul — the lane-compaction primitive.

Run on TPU: python benchmarks/probe_staging_micro.py
CPU check:  JAX_PLATFORMS=cpu python benchmarks/probe_staging_micro.py --interpret
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

STEPS = 512  # grid length for machinery probes


def _time(fn, *args, n=8):
    r = fn(*args)
    jax.block_until_ready(r)  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n, r


# ---------------------------------------------------------------- (a)
def probe_machinery(batch):
    """ns/grid-step with `batch` placement-unit equivalents of VPU work
    (each unit ≈ one (128,128) compare + select, the one-hot build's
    dominant op)."""

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        for _ in range(batch):
            io = jax.lax.broadcasted_iota(
                jnp.int32, (128, 128), 0).astype(jnp.float32)
            acc = jnp.where(io >= acc, acc * 0.999, acc + 0.001)
        o_ref[...] = acc

    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((128, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        interpret=INTERPRET,
    ))
    x = jnp.ones((128, 128), jnp.float32)
    dt, _ = _time(f, x)
    ns_step = dt / STEPS * 1e9
    print(f"(a) batch={batch:3d}: {ns_step:8.1f} ns/step  "
          f"{ns_step / max(batch, 1):7.1f} ns/unit")
    return ns_step


# ---------------------------------------------------------------- (b)
def probe_hbm_append():
    """Sequential-grid SMEM cursor + dynamic-offset DMA append to an
    un-blocked HBM output. Each step appends one (128, 8) block at a
    DATA-DEPENDENT cursor (advances by the step's "hit count"), like
    the staging kernel's per-cluster appends."""

    def kernel(counts_ref, src_ref, out_ref, cursor_ref, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cursor_ref[0] = 0

        cur = cursor_ref[0]
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(0, 128), :],
            out_ref.at[pl.ds(cur, 128), :],
            sem,
        )
        cp.start()
        cp.wait()
        cursor_ref[0] = cur + counts_ref[i]

    n_out = STEPS * 128 + 128
    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec((128, 8), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        out_shape=jax.ShapeDtypeStruct((n_out, 8), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((STEPS + 1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERPRET,
    ))
    counts = jnp.full((STEPS,), 37, jnp.int32)  # measured avg hits/row
    src = jnp.arange(128 * 8, dtype=jnp.float32).reshape(128, 8)
    try:
        dt, out = _time(f, counts, src)
    except Exception as e:  # noqa: BLE001 — report the Mosaic verdict
        print(f"(b) HBM append REJECTED: {type(e).__name__}: "
              f"{str(e)[:300]}")
        return None
    ns = dt / STEPS * 1e9
    # semantics: step i writes src at offset 37*i; later steps overwrite
    # overlapping rows — the final 128 rows at 37*(STEPS-1) must be src
    off = 37 * (STEPS - 1)
    ok = bool(jnp.all(out[off:off + 128] == src))
    print(f"(b) HBM append: {ns:8.1f} ns/append (128x8 f32), "
          f"last-block-correct={ok}")
    return ns


# ---------------------------------------------------------------- (c)
def probe_onehot_placement(rows=8):
    """Per step: lane-cumsum of `rows` bit rows via one triangular MXU
    matmul, then per row a (128,128) one-hot build + (128,128)@(128,8)
    placement matmul — the full compaction primitive for `rows` passing
    (lane-row, cluster) pairs."""

    def kernel(bits_ref, data_ref, o_ref):
        bits = bits_ref[...]  # (rows, 128) 0/1 f32
        lower = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                 <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                 ).astype(jnp.float32)
        pos = jnp.dot(bits, lower,
                      preferred_element_type=jnp.float32)  # (rows,128)
        acc = jnp.zeros((128, 8), jnp.float32)
        io = jax.lax.broadcasted_iota(
            jnp.int32, (128, 128), 0).astype(jnp.float32)
        for r in range(rows):
            onehot = ((pos[r:r + 1, :] == io + 1.0)
                      & (bits[r:r + 1, :] > 0.5)).astype(jnp.float32)
            acc = acc + jnp.dot(
                onehot, data_ref[...],
                preferred_element_type=jnp.float32)
        o_ref[...] = acc

    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (0, 0)),
            pl.BlockSpec((128, 8), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((128, 8), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32),
        interpret=INTERPRET,
    ))
    key = jax.random.PRNGKey(0)
    bits = (jax.random.uniform(key, (rows, 128)) < 0.3).astype(
        jnp.float32)
    data = jnp.arange(128 * 8, dtype=jnp.float32).reshape(128, 8)
    dt, out = _time(f, bits, data)
    ns = dt / (STEPS * rows) * 1e9
    # correctness (row 0 contribution): compacted rows of data where bit
    import numpy as np
    b0 = np.asarray(bits[0]) > 0.5
    want0 = np.asarray(data)[b0]
    got = np.asarray(out)
    ok = bool(np.allclose(got[: b0.sum()] - (got[: b0.sum()] - want0),
                          want0)) if rows == 1 else "n/a(rows>1 summed)"
    print(f"(c) rows={rows}: {ns:8.1f} ns/placement  correct={ok}")
    return ns


def main():
    print(f"device={jax.devices()[0]} interpret={INTERPRET} "
          f"steps={STEPS}")
    base = probe_machinery(0)
    for b in (1, 8, 16, 32):
        probe_machinery(b)
    print(f"    (empty-step floor {base:.0f} ns — the per-sequential-"
          f"step machinery charge)")
    probe_hbm_append()
    probe_onehot_placement(rows=1)
    probe_onehot_placement(rows=8)


if __name__ == "__main__":
    main()

"""Feasibility probe for the dense entry-row pair plumbing (round 3).

Design (PARITY round-3): the exact-mask kernel emits per-tile i32
ENTRY rows ((tn_q << 16) | cluster, INT32_MAX where no hit); one
single-operand lane-axis lax.sort orders each row front-to-back; the
traversal kernel then DMAs entry rows (VMEM -> SMEM scratch) and loops
over them, replacing the global 2-key expansion sort + cumsum offsets
+ SMEM packed pair list (and with it the pair budget, its overflow
retries, and MAX_PAIRS_PER_LAUNCH splitting).

The one novel Mosaic surface is the i32 VMEM->SMEM async copy plus
scalar reads from the SMEM i32 scratch. VMEM source slices must be
8-row aligned (measured: "Slice shape along dimension 0 must be
aligned to tiling (8)"), so rows copy in GROUPS of 8 tiles with the
double buffer alternating by group: out[i] = sum of the first
count[i] decoded cluster ids of row i.

Run: PROBE_INTERPRET=1 python benchmarks/probe_entry_rows.py (CPU
interpret semantics) or on the free TPU for the Mosaic gate + timing.
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"
if INTERPRET:
    # the axon sitecustomize hook ignores JAX_PLATFORMS; config.update
    # wins if no backend is initialized yet (tests/conftest.py) — and
    # touching the real backend would BLOCK on the TPU device lock
    jax.config.update("jax_platforms", "cpu")
G = 8  # tiles per entry-row DMA group (VMEM slice sublane alignment)


def kernel(cnt_ref, ent_ref, out_ref, sm_ref, sems):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    g = i // G
    slot = jax.lax.rem(g, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(
            ent_ref.at[pl.ds(0, G), :], sm_ref.at[0], sems.at[0]
        ).start()

    # on each group's first tile: wait own copy, prefetch next group
    @pl.when(jax.lax.rem(i, G) == 0)
    def _():
        pltpu.make_async_copy(
            ent_ref.at[pl.ds(g * G, G), :], sm_ref.at[slot],
            sems.at[slot],
        ).wait()

        @pl.when(i + G < n)
        def _():
            pltpu.make_async_copy(
                ent_ref.at[pl.ds((g + 1) * G, G), :],
                sm_ref.at[1 - slot], sems.at[1 - slot],
            ).start()

    e = cnt_ref[i]
    r = jax.lax.rem(i, G)

    def body(p, acc):
        v = sm_ref[slot, r, p]
        return acc + (v & 0xFFFF)

    out_ref[i] = jax.lax.fori_loop(0, e, body, jnp.int32(0))


def main():
    T, C = 64, 896
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 40, size=T).astype(np.int32)
    ents = np.full((T, C), np.int32(2**31 - 1))
    for t in range(T):
        cl = rng.choice(C, size=counts[t], replace=False).astype(np.int32)
        tn = rng.integers(0, 32767, size=counts[t]).astype(np.int32)
        ents[t, : counts[t]] = (tn << 16) | cl
    want = np.array(
        [int((ents[t, : counts[t]] & 0xFFFF).sum()) for t in range(T)],
        np.int32,
    )

    g = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((2, G, C), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T,), jnp.int32),
        interpret=INTERPRET,
    )
    t0 = time.time()
    got = np.asarray(g(jnp.asarray(counts), jnp.asarray(ents)))
    dt = time.time() - t0
    ok = bool((got == want).all())
    print(f"backend={jax.default_backend()} interpret={INTERPRET} "
          f"ok={ok} compile+run={dt:.1f}s")
    if not ok:
        bad = np.nonzero(got != want)[0][:5]
        print("mismatch rows", bad, got[bad], want[bad])
        return 1
    # timing pass (hardware): amortized per-row DMA + loop cost
    if not INTERPRET:
        out = jax.block_until_ready(g(jnp.asarray(counts),
                                      jnp.asarray(ents)))
        t0 = time.time()
        for _ in range(10):
            out = g(jnp.asarray(counts), jnp.asarray(ents))
        jax.block_until_ready(out)
        print(f"10 runs: {(time.time() - t0) * 1e5 / T:.2f} us/row")
    return 0


if __name__ == "__main__":
    sys.exit(main())

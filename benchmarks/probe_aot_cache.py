"""Probe: can compiled executables (incl. Pallas/Mosaic kernels) be
serialized to disk and reloaded WITHOUT recompiling on the axon backend?

The remote Mosaic service ignores the XLA persistent cache (PARITY.md
law 4, ~100–140 s per Pallas-bearing program), so the only cache that
could kill the 840 s bench warmup is one ABOVE compilation:
jax.experimental.serialize_executable pickles the loaded executable
itself. If deserialize_and_load works on this PJRT plugin and the
reloaded executable runs correctly, warmup becomes file-load time.

Run twice:
  python benchmarks/probe_aot_cache.py save   (compiles, times, saves)
  python benchmarks/probe_aot_cache.py load   (fresh process: loads, times, runs)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.serialize_executable import (
    deserialize_and_load,
    serialize,
)

PATH = "/tmp/aot_probe.bin"


def kernel(x_ref, y_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0 + y_ref[...]


def f(x, y):
    z = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x, y)
    return jnp.tanh(z).sum()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    x = jnp.ones((1024, 128), jnp.float32)
    y = jnp.full((1024, 128), 0.5, jnp.float32)
    expect = float(np.tanh(2.5)) * 1024 * 128

    if mode == "save":
        t0 = time.perf_counter()
        compiled = jax.jit(f).lower(x, y).compile()
        t_compile = time.perf_counter() - t0
        out = float(compiled(x, y))
        ser, in_tree, out_tree = serialize(compiled)
        with open(PATH, "wb") as fh:
            import pickle

            pickle.dump((ser, in_tree, out_tree), fh)
        print(f"SAVE ok: compile {t_compile:.1f}s, out={out:.1f} "
              f"(expect {expect:.1f}), {len(ser)} bytes")
    else:
        import pickle

        with open(PATH, "rb") as fh:
            ser, in_tree, out_tree = pickle.load(fh)
        t0 = time.perf_counter()
        compiled = deserialize_and_load(ser, in_tree, out_tree)
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = float(compiled(x, y))
        t_run = time.perf_counter() - t0
        ok = abs(out - expect) < 5.0  # bf16-ish tanh slack
        print(f"LOAD ok={ok}: load {t_load:.2f}s, first-run {t_run:.2f}s, "
              f"out={out:.1f} (expect {expect:.1f})")


if __name__ == "__main__":
    main()

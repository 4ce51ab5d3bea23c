"""Does bf16 double VPU elementwise throughput on this backend?

The tile kernel's per-pair cost is VPU-issue-bound: row-box tests
(~35 ns/row) and Möller–Trumbore rows (~180 ns/row) at f32 (8, 128)
tiles. bf16's native tile is (16, 128) — 2048 values per op — so IF the
VPU retires bf16 ops at the same rate, a conservatively-widened bf16
row-box pre-test (and possibly a bf16 MT candidate filter) halves that
slice of the budget. This probe times identical dependent op chains at
f32 (8,128) / bf16 (16,128) / bf16 (8,128) and reports ns per VALUE.

Run on TPU: python benchmarks/probe_bf16_vpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

REPS = 2048
OUTER = 64


def time_chain(dtype, shape, op):
    def kernel(x_ref, o_ref):
        acc = x_ref[...]
        one = jnp.asarray(1.0000001, dtype)
        eps = jnp.asarray(1e-3, dtype)
        half = jnp.asarray(0.5, dtype)
        for _ in range(REPS):
            if op == "fma":
                acc = acc * one + eps
            elif op == "cmpsel":
                acc = jnp.where(acc > half, acc * one, acc + eps)
            elif op == "minmax":
                acc = jnp.maximum(jnp.minimum(acc, one), -one) + eps
        o_ref[...] = acc

    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(OUTER,),
        in_specs=[pl.BlockSpec(shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec(shape, lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=INTERPRET,
    ))
    x = jnp.linspace(0.1, 0.9, shape[0] * shape[1]).reshape(shape)
    x = x.astype(dtype)
    r = f(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        r = f(x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    per_op = dt / (REPS * OUTER)
    per_val = per_op / (shape[0] * shape[1]) * 1e12
    print(f"{str(dtype.__name__ if hasattr(dtype, '__name__') else dtype):9s} "
          f"{str(shape):11s} {op:7s} {per_op * 1e9:7.2f} ns/op "
          f"{per_val:7.3f} ps/value")
    return per_val


def main():
    print(f"device={jax.devices()[0]} chain={REPS} grid={OUTER}")
    for op in ("fma", "cmpsel", "minmax"):
        f32 = time_chain(jnp.float32, (8, 128), op)
        try:
            b16 = time_chain(jnp.bfloat16, (16, 128), op)
            print(f"  -> bf16(16,128) / f32(8,128) per-value: "
                  f"{b16 / f32:.2f}x")
        except Exception as e:  # noqa: BLE001
            print(f"  bf16(16,128) {op} REJECTED: {str(e)[:160]}")
        try:
            time_chain(jnp.bfloat16, (8, 128), op)
        except Exception as e:  # noqa: BLE001
            print(f"  bf16(8,128) {op} REJECTED: {str(e)[:160]}")


if __name__ == "__main__":
    main()

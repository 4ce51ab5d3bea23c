"""Measure relative VPU op costs on the axon backend: fp32 divide vs
pl.reciprocal(approx) vs multiply vs compare-select chains.

Motivation: the tilewave row test (kernels/tilewave.py::_row_candidates_smem)
spends 12 full-precision divides per 12-tri row (Moller-Trumbore inv=1/det).
If divide is multi-cycle on the VPU, an approx reciprocal (+ optional Newton
step) or a division-free any-hit formulation buys a measurable slice of the
~180 ns/row budget. This probe times long dependent chains of each op inside
one Pallas kernel so per-op cost = slope vs chain length.

Run on TPU: python benchmarks/probe_vpu_ops.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SUB, LANES = 8, 128
REPS = 2048  # dependent-chain length inside the kernel
OUTER = 64   # grid steps to amortize launch overhead


def make_kernel(op):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        if op == "div":
            for _ in range(REPS):
                acc = 1.0 / (acc + 1.5)
        elif op == "recip":
            for _ in range(REPS):
                acc = pl.reciprocal(acc + 1.5, approx=False)
        elif op == "recip_approx":
            for _ in range(REPS):
                acc = pl.reciprocal(acc + 1.5, approx=True)
        elif op == "recip_newton":
            for _ in range(REPS):
                d = acc + 1.5
                r = pl.reciprocal(d, approx=True)
                acc = r * (2.0 - d * r)
        elif op == "mul":
            for _ in range(REPS):
                acc = acc * 1.0000001 + 1e-9
        elif op == "cmpsel":
            for _ in range(REPS):
                acc = jnp.where(acc > 0.5, acc * 0.999, acc + 0.001)
        else:
            raise ValueError(op)
        o_ref[...] = acc

    return kernel


def time_op(op, x):
    f = pl.pallas_call(
        make_kernel(op),
        out_shape=jax.ShapeDtypeStruct((SUB, LANES), jnp.float32),
        grid=(OUTER,),
    )
    g = jax.jit(f)
    g(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        r = g(x)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    per_op_ns = dt / (REPS * OUTER) * 1e9
    print(f"{op:14s} {dt * 1e3:8.3f} ms/call  {per_op_ns:7.3f} ns/op")
    return per_op_ns


def main():
    x = jnp.linspace(0.1, 2.0, SUB * LANES, dtype=jnp.float32).reshape(
        SUB, LANES
    )
    print(f"device={jax.devices()[0]} chain={REPS} grid={OUTER}")
    base = time_op("mul", x)
    for op in ("div", "recip", "recip_approx", "recip_newton", "cmpsel"):
        c = time_op(op, x)
        print(f"  -> {op} / mul = {c / base:.2f}x")


if __name__ == "__main__":
    main()

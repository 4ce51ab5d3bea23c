"""Can remote-Mosaic compiles overlap? (round-4 warmup lever)

The cold bunny bench pays 500-1800 s of sequential remote-Mosaic
compiles (~100-500 s per Pallas-bearing stage program). If the remote
compile service accepts concurrent requests, prewarming every stage
executable from worker THREADS (same process, one device client) or
PROCESSES would cut cold warmup to ~max(stage compile) instead of
sum(stage compiles).

Measures, with N distinct small Pallas programs (distinct constants so
nothing is cached):
  1. sequential compiles in the main thread (baseline),
  2. concurrent compiles from N threads,
  3. (optional --procs) concurrent compiles from N subprocesses — tests
     whether the tunnel's device lock serializes whole clients.

Usage: python benchmarks/probe_par_compile.py [--n 3] [--procs]
"""

import argparse
import concurrent.futures as cf
import subprocess
import sys
import time


def make_fn(tag: float):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        # distinct constant per tag -> distinct program, no cache hits
        o_ref[:] = x_ref[:] * (2.0 + tag) + tag

    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return jax.jit(fn)


def compile_one(tag: float):
    import jax
    import jax.numpy as jnp

    x = jax.ShapeDtypeStruct((256, 256), jnp.float32)
    t0 = time.perf_counter()
    make_fn(tag).lower(x).compile()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--procs", action="store_true")
    ap.add_argument("--_child", type=float, default=None)
    args = ap.parse_args()

    if args._child is not None:
        dt = compile_one(args._child)
        print(f"child {args._child}: {dt:.1f}s", flush=True)
        return

    if args.procs:
        # subprocess concurrency (tests the tunnel device lock)
        t0 = time.perf_counter()
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, "--_child", str(100 + i)])
            for i in range(args.n)
        ]
        for p in procs:
            p.wait()
        wall = time.perf_counter() - t0
        print(f"PROCS n={args.n}: wall {wall:.1f}s")
        return

    import jax

    print(f"device: {jax.devices()[0]}", flush=True)

    t0 = time.perf_counter()
    seq = [compile_one(float(i)) for i in range(args.n)]
    seq_wall = time.perf_counter() - t0
    print(f"SEQUENTIAL n={args.n}: wall {seq_wall:.1f}s "
          f"(each: {', '.join(f'{s:.1f}' for s in seq)})", flush=True)

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=args.n) as ex:
        par = list(ex.map(compile_one, [10.0 + i for i in range(args.n)]))
    par_wall = time.perf_counter() - t0
    print(f"THREADS    n={args.n}: wall {par_wall:.1f}s "
          f"(each: {', '.join(f'{s:.1f}' for s in par)})", flush=True)
    speedup = seq_wall / max(par_wall, 1e-9)
    print(f"thread-concurrency speedup: {speedup:.2f}x "
          f"({'PARALLEL - prewarm viable' if speedup > 1.5 else 'serialized'})")


if __name__ == "__main__":
    main()

"""Blocking-call time vs output size, tight loop, min of 10."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

for shape in [(8,128), (256,128), (2048,128), (2048,512), (4096,512), (8192,512)]:
    x = jnp.ones(shape, jnp.float32)
    f = jax.jit(lambda x: jnp.sin(x) * 2.0 + x)
    jax.block_until_ready(f(x))
    ts = []
    for i in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    mb = shape[0]*shape[1]*4/1e6
    print(f"{str(shape):12s} {mb:7.2f} MB: min {min(ts)*1e3:7.2f} ms "
          f"median {sorted(ts)[5]*1e3:7.2f} ms")

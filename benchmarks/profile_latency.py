"""Tunnel latency: blocking roundtrip cost, tight loop vs after-sleep."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

x = jnp.ones((8, 128), jnp.float32)
tiny = jax.jit(lambda x: x * 2.0)
jax.block_until_ready(tiny(x))

# tight blocking loop
ts = []
for i in range(30):
    t0 = time.perf_counter()
    jax.block_until_ready(tiny(x))
    ts.append(time.perf_counter() - t0)
print(f"tight blocking: min {min(ts)*1e3:.2f} ms  "
      f"median {sorted(ts)[15]*1e3:.2f} ms  max {max(ts)*1e3:.2f} ms")

# after sleep
ts = []
for i in range(5):
    time.sleep(0.5)
    t0 = time.perf_counter()
    jax.block_until_ready(tiny(x))
    ts.append(time.perf_counter() - t0)
print(f"after 0.5s sleep: {['%.1f' % (t*1e3) for t in ts]} ms")

# pipelined non-blocking: 100 calls then one block
t0 = time.perf_counter()
out = x
for i in range(100):
    out = tiny(out)
jax.block_until_ready(out)
print(f"pipelined 100 chained calls: {(time.perf_counter()-t0)*1e3:.2f} ms total")

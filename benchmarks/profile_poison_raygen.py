"""What inside raygen poisons? big constants? tile? camera_rays?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n_groups, rows = 128, 16
tile_spec = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
xs = [jax.random.uniform(jax.random.PRNGKey(i), (n_groups * rows, 128)) for i in range(2)]
def kern(a, b, o):
    o[:] = a[:] + b[:]
@jax.jit
def nullk(*p):
    return pl.pallas_call(kern, grid=(n_groups,), in_specs=[tile_spec()]*2,
                          out_specs=tile_spec(), out_shape=out_shape)(*p)
def bench(label):
    jax.block_until_ready(nullk(*xs))
    m = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(5):
            out = nullk(*xs)
        jax.block_until_ready(out)
        m = min(m, (time.perf_counter()-t0)/5)
    print(f"  [{label}] {m/n_groups*1e6:7.2f} us/step", flush=True)

which = sys.argv[1]
bench("pre")
if which == "const":
    big = np.arange(480000, dtype=np.float32)  # host numpy constant
    @jax.jit
    def f(s):
        return jnp.asarray(big) * s
    jax.block_until_ready(f(2.0))
elif which == "tile":
    x = jnp.ones(480000, jnp.float32)
    @jax.jit
    def f(x):
        return jnp.tile(x, 2)
    jax.block_until_ready(f(x))
elif which == "camera":
    from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
    from tpurt.scene.loader import load_scene
    scene = load_scene("bunny")
    px, py = full_frame_pixels_tiled(800, 600)
    pxd, pyd = jnp.asarray(px), jnp.asarray(py)
    @jax.jit
    def f(cam, pxd, pyd):
        return camera_rays(cam, pxd, pyd, 800, 600)
    o, d = f(scene.camera, pxd, pyd)
    jax.block_until_ready(o)
elif which == "closure_np":
    big1 = np.arange(960000, dtype=np.float32)
    big2 = np.arange(960000, dtype=np.float32) + 1
    @jax.jit
    def f(s):
        return jnp.asarray(big1) * s + jnp.asarray(big2)
    jax.block_until_ready(f(2.0))
elif which == "bigout":
    x = jnp.ones((960000,), jnp.float32)
    @jax.jit
    def f(x):
        return x[:, None] * jnp.ones((1, 3)), x[:, None] + jnp.ones((1, 3))
    jax.block_until_ready(f(x))
elif which == "staged_raygen":
    from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
    from tpurt.scene.loader import load_scene
    scene = load_scene("bunny")
    px, py = full_frame_pixels_tiled(800, 600)
    px_r = jnp.tile(px, 2); py_r = jnp.tile(py, 2)
    @jax.jit
    def f(cam):
        return camera_rays(cam, px_r, py_r, 800, 600)
    o, d = f(scene.camera)
    jax.block_until_ready(o)
elif which == "weakint":
    @jax.jit
    def f(x, s):
        return x * s
    jax.block_until_ready(f(jnp.ones(1024), 3))
bench(f"after {which}")

# appended cases run via: python ... <case>

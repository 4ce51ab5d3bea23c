"""What earlier process activity makes all later dispatches slow?

Runs the SAME null-kernel benchmark before and after each suspect action.
Usage: python profile_poison.py <action>
  action in: none, config, import_tpurt, load_scene, to_device,
             device_get, build_accel, camera
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(label):
    n_groups = 128
    rows = 16
    tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
    xs = [jax.random.uniform(jax.random.PRNGKey(i), (n_groups * rows, 128))
          for i in range(7)]

    def kern(*refs):
        for o in refs[-5:]:
            o[:] = refs[0][:]

    @jax.jit
    def run(*p):
        return pl.pallas_call(
            kern, grid=(n_groups,),
            in_specs=[tile()] * 7,
            out_specs=[tile()] * 5, out_shape=[out_shape] * 5,
        )(*p)

    jax.block_until_ready(run(*xs))
    m = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(*xs)
        jax.block_until_ready(out)
        m = min(m, (time.perf_counter() - t0) / 5)
    print(f"  [{label}] null kernel: {m*1e3:8.3f} ms "
          f"({m/n_groups*1e6:6.2f} us/step)", flush=True)


action = sys.argv[1] if len(sys.argv) > 1 else "none"
bench("before")

if action == "config":
    jax.config.update("jax_default_matmul_precision", "float32")
elif action == "import_tpurt":
    import tpurt  # noqa
elif action == "load_scene":
    import tpurt  # noqa
    from tpurt.scene.loader import load_scene
    scene = load_scene("cornell")
elif action == "to_device":
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene
    ds = to_device(load_scene("cornell"))
elif action == "device_get":
    x = jnp.ones((1000, 3), jnp.float32)
    _ = jax.device_get((x, x, x, x))
elif action == "build_accel":
    from tpurt.bvh.cluster import build_packet_accel
    from tpurt.render.intersectors import scene_meta
    from tpurt.scene.device import to_device
    from tpurt.scene.loader import load_scene
    scene = load_scene("cornell")
    ds = to_device(scene)
    accel = build_packet_accel(ds, scene_meta(scene))
elif action == "camera":
    from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
    from tpurt.scene.loader import load_scene
    scene = load_scene("cornell")
    px, py = full_frame_pixels_tiled(512, 512)
    o, d = camera_rays(scene.camera, px, py, 512, 512)
    jax.block_until_ready(o)

bench(f"after {action}")

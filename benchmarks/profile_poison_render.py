"""Does the render path still poison the process? Null-bench before/after
each phase of a bunny render."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n_groups, rows = 128, 16
tile = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
out_shape = jax.ShapeDtypeStruct((n_groups * rows, 128), jnp.float32)
xs = [jax.random.uniform(jax.random.PRNGKey(i), (n_groups * rows, 128)) for i in range(2)]
def kern(a, b, o):
    o[:] = a[:] + b[:]
@jax.jit
def nullk(*p):
    return pl.pallas_call(kern, grid=(n_groups,), in_specs=[tile()]*2,
                          out_specs=tile(), out_shape=out_shape)(*p)
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

bench("start")
from tpurt.scene.loader import load_scene
scene = load_scene("bunny")
bench("after load_scene")
from tpurt.scene.device import to_device
from tpurt.render.intersectors import scene_meta
meta = scene_meta(scene)
ds = to_device(scene)
bench("after to_device")
from tpurt.bvh.cluster import build_packet_accel
accel = build_packet_accel(ds, meta, scene=scene)
bench("after build_accel")
from tpurt.render.staged import make_staged_renderer
from tpurt.utils.config import get_config
import dataclasses
cfg = get_config("bunny", spp=2, spp_per_batch=2, pipeline="staged")
jit_cfg = dataclasses.replace(cfg, spp=0, seed=0, exposure=1.0)
renderer = make_staged_renderer(ds, accel, meta=meta, config=jit_cfg)
bench("after make_staged_renderer")
img, counts = renderer(scene.camera, 0, 0)
jax.block_until_ready(img)
bench("after one render batch")

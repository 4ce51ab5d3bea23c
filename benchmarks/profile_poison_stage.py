"""Which stage poisons the process?"""
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

from tpurt.scene.loader import load_scene
from tpurt.scene.device import to_device
from tpurt.render.intersectors import scene_meta
from tpurt.bvh.cluster import build_packet_accel
from tpurt.render import staged as st
from tpurt.utils.config import get_config
import dataclasses
scene = load_scene("bunny")
meta = scene_meta(scene)
ds = to_device(scene)
accel = build_packet_accel(ds, meta, scene=scene)
cfg = get_config("bunny", spp=2, spp_per_batch=2, pipeline="staged")
jit_cfg = dataclasses.replace(cfg, spp=0, seed=0, exposure=1.0)

# rebuild the stage closures manually (mirror make_staged_renderer)
from tpurt.render.integrator import make_intersectors
closest, any_hit = make_intersectors(ds, accel, meta=meta, config=jit_cfg)
from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
from tpurt.core.prng import TAG_JITTER, PixelSampler
w, h = jit_cfg.width, jit_cfg.height
px, py = full_frame_pixels_tiled(w, h)
px_r = jnp.tile(px, 2); py_r = jnp.tile(py, 2)

bench("pre")
@jax.jit
def raygen(cam):
    org, dirn = camera_rays(cam, px_r, py_r, w, h)
    return org, dirn
org, dirn = raygen(scene.camera)
jax.block_until_ready(org)
bench("after raygen")

@jax.jit
def trace(org, dirn):
    hit = closest(org, dirn, 0.0, jnp.inf)
    return hit
hit = trace(org, dirn)
jax.block_until_ready(hit.t)
bench("after trace")

from tpurt import materials
@jax.jit
def shade(org, dirn, hit):
    attrs = materials.resolve_hit(ds, org, dirn, hit.t, hit.u, hit.v,
                                  hit.tri, hit.inst)
    return attrs.albedo
alb = shade(org, dirn, hit)
jax.block_until_ready(alb)
bench("after shade(resolve_hit)")

@jax.jit
def occl(org, dirn):
    return any_hit(org, dirn, 0.0, jnp.full(org.shape[0], 10.0))
occ = occl(org, dirn)
jax.block_until_ready(occ)
bench("after any_hit")

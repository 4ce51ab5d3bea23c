"""Characterize device timing variance: same op measured repeatedly."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.bvh.cluster import build_packet_accel
from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
from tpurt.kernels import packet as pk
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device
from tpurt.scene.loader import load_scene

scene = load_scene("cornell")
meta = scene_meta(scene)
ds = to_device(scene)
accel = build_packet_accel(ds, meta)
px, py = full_frame_pixels_tiled(512, 512)
o, d = camera_rays(scene.camera, px, py, 512, 512)
n = o.shape[0]
closest, _ = pk.make_packet_intersector(ds, accel, ray_sort="none")
run = jax.jit(lambda o, d: closest(o, d, 0.0, jnp.inf).t)

# also a plain big elementwise op as control
x = jnp.ones((4096, 512), jnp.float32)
ctrl = jax.jit(lambda x: jnp.sin(x) * 2.0 + x)

jax.block_until_ready(run(o, d))
jax.block_until_ready(ctrl(x))

for i in range(12):
    t0 = time.perf_counter()
    jax.block_until_ready(run(o, d))
    t_k = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(ctrl(x))
    t_c = time.perf_counter() - t0
    print(f"round {i:2d}: kernel {t_k*1e3:8.2f} ms  ctrl {t_c*1e3:6.2f} ms")
    time.sleep(0.3)

"""Capture a Perfetto/XPlane profile of one tile-wavefront trace on TPU.

Writes the trace to /tmp/tile_trace/ then prints the top ops by self
time from the xplane proto (no TensorBoard needed).
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.bvh.paircluster import build_pair_accel
from tpurt.core.camera import camera_rays, full_frame_pixels_tiled
from tpurt.kernels.tilewave import make_tile_intersector
from tpurt.render import load_scene
from tpurt.render.intersectors import scene_meta
from tpurt.scene.device import to_device
from tpurt.utils.config import get_config


def main():
    sort = sys.argv[1] if len(sys.argv) > 1 else "morton"
    cfg = get_config("bunny", width=800, height=600)
    scene = load_scene(cfg.scene)
    meta = scene_meta(scene)
    ds = to_device(scene)
    accel = jax.device_put(build_pair_accel(ds, meta, scene=scene))

    w, h = cfg.width, cfg.height
    px, py = full_frame_pixels_tiled(w, h)
    org_np, dir_np = camera_rays(scene.camera, np.asarray(px),
                                 np.asarray(py), w, h)
    n = np.asarray(org_np).shape[0]
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    org = jax.device_put(jnp.asarray(np.asarray(org_np)))
    dirn = jax.device_put(jnp.asarray(np.asarray(dir_np)[perm]))

    @jax.jit
    def run(accel_dev, org, dirn):
        c, _ = make_tile_intersector(ds, accel_dev, pairs_per_tile=0,
                                     pairs_avg=96, ray_sort=sort)
        hit, stats = c.with_stats(org, dirn, 0.0, jnp.inf)
        return hit.t, stats

    out = run(accel, org, dirn)
    jax.block_until_ready(out)

    os.makedirs("/tmp/tile_trace", exist_ok=True)
    with jax.profiler.trace("/tmp/tile_trace"):
        for _ in range(3):
            out = run(accel, org, dirn)
        jax.block_until_ready(out)

    # summarize the xplane proto
    paths = glob.glob("/tmp/tile_trace/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    try:
        from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
    except Exception:
        pass
    # minimal xplane parse without tensorflow
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except Exception:
        xplane_pb2 = None
    if xplane_pb2 is None:
        print("no xplane proto lib; raw files left in /tmp/tile_trace")
        return
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            totals = {}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    totals[name] = totals.get(name, 0) + ev.duration_ps
            top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
            print(f"== plane {plane.name}")
            for name, ps in top:
                print(f"  {ps/1e9/3:10.3f} ms  {name[:90]}")


if __name__ == "__main__":
    main()

"""Device-mesh render sharding (SURVEY.md §2.3 X1/X2, §5 "distributed
communication backend").

One jitted SPMD program renders a progressive batch across a 2-D
``jax.sharding.Mesh``:

  axis "tile"   (X1): framebuffer rows are partitioned — each shard traces
                      only its rows; scene/BVH/camera are replicated.
  axis "sample" (X2): each shard renders its rows with a decorrelated RNG
                      stream; ``psum`` over the axis merges sample sums
                      (rides ICI — intra-pod — when the mesh is laid out on
                      a pod slice; ``jax.distributed.initialize()`` extends
                      the same program across hosts, no NCCL layer).

Determinism: the per-shard key is ``fold_in(batch_key, sample_index)`` and
psum order is fixed by the mesh, so a fixed seed gives bit-identical frames
for a fixed mesh shape (SURVEY.md §4.4/§4.5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpurt.core.camera import Camera
from tpurt.render.integrator import render_pixels
from tpurt.render.intersectors import SceneMeta
from tpurt.scene.device import DeviceScene
from tpurt.utils.config import RenderConfig


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Wire ``jax.distributed`` for multi-host meshes (SURVEY.md §5
    "distributed communication backend").

    On a TPU pod slice every host runs the same program; after this call
    ``jax.devices()`` returns the GLOBAL device list, so
    ``make_render_mesh`` lays the ("sample", "tile") mesh across hosts and
    the existing shard_mapped stages run unchanged — XLA routes the psum
    merges over ICI within a slice and DCN across slices. With no
    arguments the TPU runtime auto-detects the cluster; explicit
    (coordinator, num_processes, process_id) supports CPU/GPU clusters and
    the single-host degenerate case (num_processes=1), which is what the
    smoke test exercises — multi-host hardware is not available on the
    dev box. Returns (process_index, process_count). Idempotent: a second
    call is a no-op."""
    import jax

    if jax._src.distributed.global_state.client is not None:  # initialized
        return jax.process_index(), jax.process_count()
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def make_render_mesh(n_sample_shards: int = 1, n_tile_shards: int = 1,
                     devices=None) -> Mesh:
    """("sample", "tile") mesh over the first n_sample*n_tile devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    need = n_sample_shards * n_tile_shards
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for a {n_sample_shards}x{n_tile_shards} "
            f"mesh, have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(n_sample_shards, n_tile_shards)
    return Mesh(grid, ("sample", "tile"))


@functools.partial(
    jax.jit, static_argnames=("meta", "config", "mesh", "rows_per_shard")
)
def render_batch_distributed(
    ds: DeviceScene,
    cam: Camera,
    seed,
    sample0,
    accel=None,
    *,
    meta: SceneMeta,
    config: RenderConfig,
    mesh: Mesh,
    rows_per_shard: int,
) -> jnp.ndarray:
    """One distributed progressive batch → (H_padded, W, 3) radiance sum.

    Adds ``config.spp_per_batch * mesh.shape['sample']`` samples per pixel:
    sample shard s traces global sample indices
    [sample0 + s·spp_per_batch, …) — disjoint windows of the same
    counter-based stream, so the merged image is bit-identical to a
    single-chip render of the same sample range (SURVEY.md §4.4).
    H is padded up to rows_per_shard * n_tile rows; the driver crops.
    """
    w = config.width

    def shard_fn(ds, cam, seed, sample0, accel):
        tile_id = jax.lax.axis_index("tile")
        sample_id = jax.lax.axis_index("sample")
        row0 = tile_id * rows_per_shard
        rows = row0 + jnp.arange(rows_per_shard, dtype=jnp.int32)
        py = jnp.repeat(rows, w)
        px = jnp.tile(jnp.arange(w, dtype=jnp.int32), rows_per_shard)
        shard_sample0 = (
            jnp.asarray(sample0, jnp.uint32)
            + sample_id.astype(jnp.uint32) * jnp.uint32(config.spp_per_batch)
        )
        radiance, counts = render_pixels(
            ds, cam, seed, shard_sample0, accel, px, py,
            meta=meta, config=config,
        )  # (rows_per_shard * w, 3), (2,)
        # X2 merge over ICI: all_gather + fixed-order unrolled sum, NOT
        # psum — psum reassociates floats layout-dependently; this order
        # equals the single-chip progressive loop's, making the N-chip
        # frame bit-identical to the 1-chip frame (SURVEY.md §4.4)
        g = jax.lax.all_gather(radiance, "sample")
        radiance = g[0]
        for s in range(1, mesh.shape["sample"]):
            radiance = radiance + g[s]
        counts = jax.lax.psum(counts, ("sample", "tile"))
        return radiance.reshape(rows_per_shard, w, 3), counts

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P("tile", None, None), P()),
        check_vma=False,
    )
    return fn(ds, cam, jnp.asarray(seed, jnp.uint32),
              jnp.asarray(sample0, jnp.uint32), accel)


def distributed_spec(config: RenderConfig, mesh: Optional[Mesh]):
    """(rows_per_shard, samples_added_per_batch) for a config on a mesh."""
    if mesh is None:
        return config.height, config.spp_per_batch
    n_tile = mesh.shape["tile"]
    rows_per_shard = -(-config.height // n_tile)
    return rows_per_shard, config.spp_per_batch * mesh.shape["sample"]

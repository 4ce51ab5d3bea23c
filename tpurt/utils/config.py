"""Config / flag system (SURVEY.md §5 "Config / flag system").

One frozen (hashable — jit-static) dataclass ``RenderConfig`` + per-demo
presets matching the benchmark ladder (BASELINE.json:7–11). CLI:
``python -m tpurt render --config cornell_pt``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    scene: str = "cornell"  # preset name or .obj/.gltf/.glb path
    width: int = 512
    height: int = 512
    spp: int = 64  # total samples per pixel (progressive)
    spp_per_batch: int = 4  # samples folded inside one jitted batch
    # cap on rays per jitted batch: samples are flattened into the ray
    # axis, so width·height·spp_per_batch is clamped to this. Bigger
    # batches amortize per-trace sort/mask machinery and dispatch:
    # bunny 800×600 measured 8.0 → 10.6 Mrays/s going 2 → 8 spp/batch
    # on v5e (staged pipeline; the round-1 megakernel OOM'd at 2M rays,
    # the staged pipeline runs 4M-ray batches fine)
    max_rays_per_batch: int = 4 << 20
    max_bounces: int = 4  # 0 = primary rays only
    use_nee: bool = True  # next-event estimation (shadow rays)
    shading_mode: str = "full"  # "full" | "flat" (hello-triangle)
    # base-color texture filter: "nearest" (1 row gather/hit, default) or
    # "bilinear" (glTF LINEAR, 4 gathers — measurably slower on axon)
    texture_filter: str = "nearest"
    seed: int = 0
    exposure: float = 1.0
    # "auto" | "brute" | "bvh" | "bvh_packet" | "bvh_pair" | "bvh_tile"
    # (auto resolves to bvh_tile on TPU — see resolved_intersector)
    intersector: str = "auto"
    # tile-accel instancing: "auto" picks two-level TLAS/BLAS cluster
    # tables (shared object-space BLAS rows + per-instance transforms,
    # SURVEY.md C9) when instances reuse meshes ≥ 2×; "flatten" bakes
    # every instance to world space; "two_level" forces the TLAS path
    instancing: str = "auto"
    # pair-wavefront budget: static (ray, cluster) pair capacity per trace
    # = pairs_per_ray × rays (tpurt.kernels.pairwave; overflow drops the
    # trailing clusters of a ray chunk and is flagged in trace stats)
    pairs_per_ray: int = 8
    # tile-wavefront budgets (tpurt.kernels.tilewave): per-tile cluster
    # clamp (0 = all clusters, exact) and average pairs/tile sizing the
    # kernel grid per WAVE KIND (0 = all clusters). Measured demand on
    # the bunny ladder config (800×600): primary 18 avg pairs/tile with
    # the static screen-tile order, diffuse-bounce 296 with the octant
    # sort, shadow ≤ 135 with the octant sort — the defaults carry
    # headroom, and render_scene auto-retries with doubled budgets when
    # the on-device overflow flag trips (no silent hit loss).
    pairs_per_tile: int = 0
    pairs_avg: int = 48  # primary closest waves
    pairs_avg_bounce: int = 384  # bounce closest waves
    pairs_avg_shadow: int = 192  # shadow/any-hit waves
    # tile-wavefront ray reorder per wave kind: "none" | "morton"
    # (origin-major Morton) | "octant" (direction-sign-major — measured
    # 2.4–6× tighter tile unions for diffuse bounce + shadow waves).
    # Primaries keep the static screen-tile order (a sort only widens
    # their tile unions: 18 → 28 avg pairs). All proven pure reorders by
    # tests/unit/test_tilewave.py.
    tile_primary_sort: str = "none"
    tile_ray_sort: str = "octant"
    tile_shadow_sort: str = "octant"
    # sorted-wave pipeline (render/staged.py): ONE payload-through
    # lax.sort per bounce (in the shade_occlude stage) replaces the
    # intersector's per-trace forward+restore sorts; traces then run
    # sort-free in the carried order. Single-chip staged pipeline only;
    # env TPURT_SORTED_WAVE=0/1 overrides for A/B.
    sorted_wave: bool = False
    # live-wave truncation caps (sorted-wave pipeline): entry b = max
    # rays kept for the bounce-(b+1) trace after bounce b's shade sorts
    # dead rays to the back (rounded up to the kernel tile size). () = no
    # truncation. Caps come from the measured per-bounce live counts
    # (stats "live_counts" / benchmarks/autotune.json) with margin; a
    # cap that cuts ALIVE rays trips the live_overflow counter and
    # render_scene re-renders uncapped — never a silent truncation.
    live_caps: tuple = ()
    # shadow-wave truncation caps (default staged pipeline, round 4):
    # entry b = max rays kept for bounce b's occlusion trace (the
    # intersector's internal octant sort puts non-want rays at the
    # back; NEE want fractions measured 52/12/6% on the bunny ladder).
    # Same measured-with-margin + loud-overflow contract as live_caps.
    shadow_caps: tuple = ()
    # BVH tuning
    bvh_leaf_size: int = 4
    # runtime ray reordering before packetization: "none" (megakernel
    # already traces in static screen-tile order), "octant" (cheap 9-bin
    # counting partition by direction octant + dead-lane compaction), or
    # "morton" (full origin×direction Morton argsort)
    packet_ray_sort: str = "none"
    # execution pipeline: "mega" fuses a whole progressive batch into one
    # XLA program; "staged" runs one small executable per wave stage (see
    # tpurt.render.staged); "wavefront" is the compaction pipeline
    # (G8/G9). "auto": staged on TPU — with dispatch de-poisoned it beats
    # mega e2e (bunny 4.36 vs 3.6 Mrays/s) AND compiles ~3× faster
    # (265 s vs >890 s through the remote compile service); mega on CPU
    # (fusion wins there, compiles are local/fast).
    pipeline: str = "auto"  # "auto" | "mega" | "staged" | "wavefront"

    def resolved_pipeline(self, platform: str) -> str:
        if self.pipeline != "auto":
            return self.pipeline
        return "staged" if platform == "tpu" else "mega"
    wavefront_capacity: int = 1 << 16  # ring-buffer lanes (G8)
    material_sort: bool = True  # G9 sort-by-material before shading
    # distributed execution (X1/X2): axis sizes; 1 = single chip
    n_sample_shards: int = 1
    n_tile_shards: int = 1

    def resolved_intersector(self, num_instanced_tris: int,
                             platform: str = "tpu") -> str:
        if self.intersector != "auto":
            return self.intersector
        if platform == "tpu":
            # Tile-wavefront (tpurt.kernels.tilewave): matches the packet
            # kernel on coherent primaries and is 3–6× faster on bounce
            # waves (benchmarks/sweep_tile.py); the all-pairs path
            # materializes (rays × tris) temporaries → HBM-bound even on
            # the 36-tri Cornell box.
            return "bvh_tile"
        # CPU: dense all-pairs below ~128 tris, jnp two-level BVH above.
        return "brute" if num_instanced_tris <= 128 else "bvh"


# The five-config benchmark ladder (BASELINE.json:7–11, SURVEY.md §6).
PRESETS = {
    "hello_triangle": RenderConfig(
        scene="hello_triangle", width=800, height=600, spp=1, spp_per_batch=1,
        max_bounces=0, use_nee=False, shading_mode="flat", intersector="auto",
    ),
    "cornell": RenderConfig(
        # 16 spp/batch: small waves are dispatch-RTT-bound — fatter
        # programs overlap the per-dispatch RTT (ladder 4.7 -> measured
        # 58 Mrays/s in a 1-batch variant); 512*512*16 == the 4M clamp
        scene="cornell", width=512, height=512, spp=64, spp_per_batch=16,
        max_bounces=0, use_nee=True, intersector="auto",
    ),
    "bunny": RenderConfig(
        scene="bunny", width=800, height=600, spp=16, spp_per_batch=8,
        max_bounces=2, use_nee=True, intersector="auto",
    ),
    "cornell_pt": RenderConfig(
        scene="cornell_pt", width=512, height=512, spp=256,
        spp_per_batch=16,
        max_bounces=4, use_nee=True, intersector="auto",
    ),
    "sponza": RenderConfig(
        scene="sponza", width=1920, height=1080, spp=8, spp_per_batch=2,
        max_bounces=2, use_nee=True, intersector="auto",
    ),
}


def get_config(name: str, **overrides) -> RenderConfig:
    cfg = PRESETS.get(name)
    if cfg is None:
        cfg = RenderConfig(scene=name)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg

"""Counter-based per-pixel RNG (SURVEY.md §4.4 determinism contract).

The reference seeds its raygen shader per pixel/frame; here every random
draw is a pure hash of (global seed, global sample index, absolute pixel id,
draw-site tag). Consequences:

  * bit-identical framebuffers across runs for a fixed seed;
  * bit-identical across 1-chip and N-chip sharding and any tile layout
    (a pixel's randomness never depends on which shard traced it or how
    the batch was shaped) — SURVEY.md §4.4/§4.5;
  * resume-safe: the progressive sample counter indexes the stream, so a
    checkpointed render continues the exact same sequence (SURVEY.md §5).

The hash is lowbias32 (Wellons) — a handful of uint32 VPU ops with FIXED
shift amounts, far cheaper per draw than threefry key splitting in the
bounce loop. (PCG-RXS-M-XS was tried first; its *data-dependent* shift
``x >> (x >> 28)`` takes minutes to compile on the TPU backend — fixed-shift
mixers are the TPU-friendly choice.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# numpy (not jnp) scalar: a module-level jnp constant initializes the XLA
# backend at import time, which breaks jax.distributed.initialize() (it
# must run before ANY backend init — tpurt.parallel.mesh.init_multihost)
_GOLDEN = np.uint32(0x9E3779B9)


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32: high-quality 32-bit mixer with static shifts only."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _to_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 → f32 in [0, 1) using the top 24 bits (exact in f32)."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


class PixelSampler(NamedTuple):
    """Stateless per-pixel sample stream. ``base`` already mixes seed,
    sample index, and pixel id; each draw site perturbs with a static tag."""

    base: jnp.ndarray  # (...,) uint32

    @staticmethod
    def make(seed, sample_index, pixel_id: jnp.ndarray) -> "PixelSampler":
        s = pcg_hash(jnp.asarray(seed, jnp.uint32))
        s = pcg_hash(s + jnp.asarray(sample_index, jnp.uint32))
        base = pcg_hash(s + pixel_id.astype(jnp.uint32) * _GOLDEN)
        return PixelSampler(base=base)

    def u01(self, tag) -> jnp.ndarray:
        """One uniform in [0, 1) per pixel for a draw-site tag.

        ``tag`` is a static int in the megakernel; the wavefront pipeline
        passes a traced per-lane uint32 vector (lanes sit at different bounce
        depths — SURVEY.md §2.2 G8), which broadcasts against ``base``."""
        tag = jnp.asarray(tag, jnp.uint32)
        return _to_unit_float(pcg_hash(self.base + tag * _GOLDEN))

    def u2(self, tag) -> jnp.ndarray:
        """(..., 2) uniforms — two consecutive tags."""
        return jnp.stack([self.u01(tag), self.u01(tag + 1)], axis=-1)


# Draw-site tag layout: the camera jitter uses tags 0–1; bounce b uses
# tags BOUNCE_BASE + b*BOUNCE_STRIDE + site. Static ints — free at trace.
TAG_JITTER = 0
BOUNCE_BASE = 8
BOUNCE_STRIDE = 8
SITE_LIGHT_PICK = 0
SITE_LIGHT_BARY = 1  # uses 2 tags
SITE_DIFFUSE = 3  # uses 2 tags
SITE_SPHERE = 5  # uses 2 tags
SITE_FRESNEL = 7


def bounce_tag(bounce: int, site: int) -> int:
    return BOUNCE_BASE + bounce * BOUNCE_STRIDE + site

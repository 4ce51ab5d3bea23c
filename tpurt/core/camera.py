"""Camera model and primary-ray generation (SURVEY.md §2.1 C13, §2.2 G1).

The reference drives ray generation from an inverse view/projection matrix in
its raygen shader and a host-side orbit/fly camera (SURVEY.md C13 [RECON],
reference mount empty). Here the camera is a frozen pytree and ray generation
is a pure broadcasted jnp function — the jnp twin of the Pallas raygen kernel
(``tpurt.kernels.raygen``).

Conventions (fixed for golden-image stability, SURVEY.md §7 hard parts):
  * Right-handed, y-up world. Camera looks from ``position`` toward
    ``look_at``; ``vfov_deg`` is the full vertical field of view.
  * Pixel (0, 0) is the top-left of the image; rays pass through pixel
    centers plus an optional sub-pixel jitter in [-0.5, 0.5)^2 for AA.
  * Image shape is (H, W, 3), linear RGB f32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpurt.core.vecmath import normalize


class Camera(NamedTuple):
    """Pinhole camera. A NamedTuple so it is a pytree and jit-stable."""

    position: jnp.ndarray  # (3,) f32
    look_at: jnp.ndarray  # (3,) f32
    up: jnp.ndarray  # (3,) f32
    vfov_deg: jnp.ndarray  # () f32

    @staticmethod
    def make(position, look_at, up=(0.0, 1.0, 0.0), vfov_deg=45.0) -> "Camera":
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return Camera(f32(position), f32(look_at), f32(up), f32(vfov_deg))


def camera_basis(cam: Camera):
    """Orthonormal camera frame: right, up, forward (forward points at scene)."""
    forward = normalize(cam.look_at - cam.position)
    right = normalize(jnp.cross(forward, cam.up))
    up = jnp.cross(right, forward)
    return right, up, forward


def camera_rays(cam: Camera, px: jnp.ndarray, py: jnp.ndarray,
                width: int, height: int, jitter=None):
    """Primary rays through pixels (px, py) — the G1 raygen math.

    px/py: any-shaped f32/i32 arrays of pixel column/row indices.
    jitter: optional pair of arrays shaped like px with values in [0, 1)
        (0.5 means pixel center). When None, rays go through pixel centers.
    Returns (org, dir): org broadcast to px.shape + (3,), dir unit length.
    """
    px = jnp.asarray(px, jnp.float32)
    py = jnp.asarray(py, jnp.float32)
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter
    right, up, forward = camera_basis(cam)
    tan_half = jnp.tan(jnp.deg2rad(cam.vfov_deg) * 0.5)
    aspect = width / height
    # NDC in [-1, 1], y up (row 0 is the top of the image).
    ndc_x = ((px + jx) / width * 2.0 - 1.0) * tan_half * aspect
    ndc_y = (1.0 - (py + jy) / height * 2.0) * tan_half
    d = (
        forward
        + ndc_x[..., None] * right
        + ndc_y[..., None] * up
    )
    d = normalize(d)
    org = jnp.broadcast_to(cam.position, d.shape)
    return org, d


def full_frame_pixels(width: int, height: int):
    """(H*W,) pixel column/row index vectors in row-major order."""
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    return px.reshape(-1), py.reshape(-1)


def full_frame_pixels_tiled(width: int, height: int, tile: int = 32):
    """(H*W,) pixel indices in ``tile``×``tile`` screen-tile order.

    Consecutive runs of tile² pixels form square screen tiles, so the packet
    intersector's 1024-ray packets become tight view frusta with NO runtime
    sort (a 1024-pixel run of row-major order would span 1–2 full image
    rows). Computed on host at trace time — a static permutation. Secondary
    rays inherit the order from their parents (hit points of a tile are
    spatially clustered), which keeps bounce packets coherent too.
    """
    import numpy as np

    py, px = np.meshgrid(
        np.arange(height, dtype=np.int64),
        np.arange(width, dtype=np.int64),
        indexing="ij",
    )
    px = px.reshape(-1)
    py = py.reshape(-1)
    key = (
        ((py // tile) * (width // tile + 1) + (px // tile)) * (tile * tile)
        + (py % tile) * tile
        + (px % tile)
    )
    order = np.argsort(key, kind="stable")
    return (
        jnp.asarray(px[order], jnp.int32),
        jnp.asarray(py[order], jnp.int32),
    )


def orbit_camera(center, radius, theta, phi, vfov_deg=45.0, up=(0, 1, 0)) -> Camera:
    """Orbit camera used by the animated flythrough driver (SURVEY.md C13).

    theta: azimuth (radians), phi: elevation (radians).
    """
    center = jnp.asarray(center, jnp.float32)
    offset = radius * jnp.stack(
        [
            jnp.cos(phi) * jnp.sin(theta),
            jnp.sin(phi),
            jnp.cos(phi) * jnp.cos(theta),
        ]
    )
    return Camera.make(center + offset, center, up, vfov_deg)


def flythrough_path(waypoints, look_ats, n_frames: int, vfov_deg=45.0):
    """Piecewise-linear camera path: the Sponza flythrough driver
    (BASELINE.json:11). Returns a list of Camera, one per frame."""
    waypoints = jnp.asarray(waypoints, jnp.float32)
    look_ats = jnp.asarray(look_ats, jnp.float32)
    n_seg = waypoints.shape[0] - 1
    cams = []
    for f in range(n_frames):
        s = f / max(n_frames - 1, 1) * n_seg
        i = min(int(s), n_seg - 1)
        a = s - i
        pos = (1 - a) * waypoints[i] + a * waypoints[i + 1]
        tgt = (1 - a) * look_ats[i] + a * look_ats[i + 1]
        cams.append(Camera.make(pos, tgt, vfov_deg=vfov_deg))
    return cams

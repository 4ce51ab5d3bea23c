"""Progressive accumulation framebuffer (SURVEY.md §2.1 C3/C12, §2.2 G10).

The reference's swapchain + storage-image accumulation becomes a pure
functional ``FrameState`` pytree: running radiance sum + sample count + RNG
key. Camera motion ⇒ ``reset`` (the reference zeroes its accumulation counter
on camera move, BASELINE.json:10 / SURVEY.md §3.5); restart/resume is just
serializing this pytree (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FrameState(NamedTuple):
    """Accumulation state. ``accum`` lives on device; the counters are host
    Python ints ON PURPOSE: converting device scalars (``int(x)``) is a
    device→host transfer, and on the tunneled axon backend the first D2H of
    a process permanently degrades all later dispatches ~100×
    (benchmarks/profile_poison.py). Counters are cheap host bookkeeping."""

    accum: jnp.ndarray  # (H, W, 3) f32 — running *sum* of radiance samples
    n_samples: int  # samples accumulated per pixel; also the next global
    # sample index (the RNG stream position — resume-safe)
    seed: int  # base seed of the counter-based RNG
    batch_index: int  # next progressive batch id

    @property
    def height(self) -> int:
        return self.accum.shape[0]

    @property
    def width(self) -> int:
        return self.accum.shape[1]


def new_frame_state(width: int, height: int, seed: int = 0) -> FrameState:
    return FrameState(
        accum=jnp.zeros((height, width, 3), jnp.float32),
        n_samples=0,
        seed=int(seed),
        batch_index=0,
    )


def reset(state: FrameState) -> FrameState:
    """Accumulation reset on camera move (SURVEY.md §3.5)."""
    return state._replace(
        accum=jnp.zeros_like(state.accum),
        n_samples=0,
        batch_index=0,
    )


def accumulate(state: FrameState, radiance_sum: jnp.ndarray,
               samples_added: int) -> FrameState:
    """Fold one rendered sample batch into the running accumulation (G10)."""
    return state._replace(
        accum=state.accum + radiance_sum,
        n_samples=int(state.n_samples) + int(samples_added),
        batch_index=int(state.batch_index) + 1,
    )


def resolve(state: FrameState) -> jnp.ndarray:
    """Mean radiance image (H, W, 3) f32 linear."""
    n = jnp.float32(max(int(state.n_samples), 1))
    return state.accum / n


def tonemap(linear: jnp.ndarray, exposure: float = 1.0,
            gamma: float = 2.2) -> jnp.ndarray:
    """Clamp + gamma tonemap → display-space f32 in [0, 1] (G10)."""
    x = jnp.clip(linear * exposure, 0.0, 1.0)
    return x ** (1.0 / gamma)


def pack_u8(display: jnp.ndarray) -> jnp.ndarray:
    """Display-space f32 [0,1] → uint8 with round-half-away (G10 pack)."""
    return jnp.clip(display * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)


def to_png_array(state: FrameState, exposure: float = 1.0) -> np.ndarray:
    """Host readback: resolve → tonemap → uint8 numpy (the "present")."""
    return np.asarray(pack_u8(tonemap(resolve(state), exposure)))

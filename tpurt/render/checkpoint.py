"""Checkpoint / resume of progressive renders (SURVEY.md §5).

The reference is an interactive demo with no persistence — its only state
lifecycle is the accumulation reset on camera move (SURVEY.md §3.5). The
rebuild's progressive renderer is naturally elastic: the whole render state
is the ``FrameState`` pytree (radiance sum, sample count, RNG seed, batch
cursor), so checkpointing is one ``.npz`` write and recovery is loading it
and continuing the batch loop. Because the RNG is counter-based (pure
function of seed × sample index × pixel — tpurt.core.prng), a resumed
render draws the exact same sample stream: kill/restart mid-render is
bit-identical to an uninterrupted run (fault-injection test in
tests/unit/test_checkpoint.py).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from tpurt.render import framebuffer as fb
from tpurt.utils.config import RenderConfig


_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: fb.FrameState,
                    config: RenderConfig | None = None,
                    camera=None) -> None:
    """Serialize a FrameState (+ optional config/camera context) to .npz."""
    arrays = {
        "version": np.asarray(_FORMAT_VERSION, np.int32),
        "accum": np.asarray(state.accum),
        "n_samples": np.asarray(state.n_samples),
        "seed": np.asarray(state.seed),
        "batch_index": np.asarray(state.batch_index),
    }
    if config is not None:
        arrays["config_json"] = np.frombuffer(
            json.dumps(dataclasses.asdict(config)).encode(), np.uint8
        )
    if camera is not None:
        arrays["cam_position"] = np.asarray(camera.position)
        arrays["cam_look_at"] = np.asarray(camera.look_at)
        arrays["cam_up"] = np.asarray(camera.up)
        arrays["cam_vfov_deg"] = np.asarray(camera.vfov_deg)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(path: str):
    """Returns (FrameState, config | None, Camera | None)."""
    with np.load(path) as z:
        version = int(z["version"])
        if version != _FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format v{version} != supported v{_FORMAT_VERSION}"
            )
        state = fb.FrameState(
            accum=jnp.asarray(z["accum"]),
            n_samples=int(z["n_samples"]),
            seed=int(z["seed"]),
            batch_index=int(z["batch_index"]),
        )
        config = None
        if "config_json" in z:
            raw = json.loads(z["config_json"].tobytes().decode())
            # JSON has no tuple: restore tuple-typed fields (live_caps)
            # so the loaded config compares equal to the saved one
            raw = {k: tuple(v) if isinstance(v, list) else v
                   for k, v in raw.items()}
            config = RenderConfig(**raw)
        camera = None
        if "cam_position" in z:
            from tpurt.core.camera import Camera

            camera = Camera.make(
                z["cam_position"], z["cam_look_at"], z["cam_up"],
                float(z["cam_vfov_deg"]),
            )
    return state, config, camera

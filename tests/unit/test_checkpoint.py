"""Checkpoint/resume + fault injection (SURVEY.md §5 failure detection).

The elasticity contract: killing a progressive render at any batch boundary
and resuming from the checkpoint is BIT-IDENTICAL to the uninterrupted run
(counter-based RNG ⇒ the sample stream has no hidden state)."""

import os

import numpy as np

from tpurt.render import framebuffer as fb
from tpurt.render import render_scene
from tpurt.render.checkpoint import load_checkpoint, save_checkpoint
from tpurt.utils.config import get_config


def _config():
    return get_config(
        "cornell_pt", width=32, height=24, spp=8, spp_per_batch=2,
        max_bounces=2,
    )


def test_resume_bit_identical(tmp_path):
    config = _config()
    straight, _ = render_scene(config)

    # fault injection: stop after 2 of 4 batches, checkpoint, "restart"
    partial, _ = render_scene(
        get_config("cornell_pt", **{**config.__dict__, "spp": 4})
    )
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(path, partial, config)
    loaded, ck_config, _ = load_checkpoint(path)
    assert ck_config == config
    assert int(loaded.n_samples) == 4
    resumed, _ = render_scene(config, state=loaded)

    assert int(resumed.n_samples) == int(straight.n_samples)
    np.testing.assert_array_equal(
        np.asarray(resumed.accum), np.asarray(straight.accum)
    )


def test_checkpoint_roundtrip_camera(tmp_path):
    from tpurt.core.camera import Camera

    state = fb.new_frame_state(8, 6, seed=42)
    cam = Camera.make((1, 2, 3), (0, 0, 0), vfov_deg=60.0)
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(path, state, camera=cam)
    loaded, config, cam2 = load_checkpoint(path)
    assert config is None
    assert int(loaded.seed) == 42
    np.testing.assert_allclose(np.asarray(cam2.position), [1, 2, 3])
    assert float(np.asarray(cam2.vfov_deg)) == 60.0


def test_determinism_same_seed():
    config = get_config("cornell", width=24, height=16, spp=4,
                        spp_per_batch=2)
    a, _ = render_scene(config)
    b, _ = render_scene(config)
    np.testing.assert_array_equal(np.asarray(a.accum), np.asarray(b.accum))


def test_different_seed_differs():
    config = get_config("cornell", width=24, height=16, spp=4,
                        spp_per_batch=2)
    a, _ = render_scene(config)
    b, _ = render_scene(get_config("cornell", **{**config.__dict__,
                                                 "seed": 99}))
    assert not np.array_equal(np.asarray(a.accum), np.asarray(b.accum))

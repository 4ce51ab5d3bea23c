"""CLI smoke tests (SURVEY.md L5; VERDICT r1 §8: every documented flag
reachable). Drives tpurt.cli.main() in-process on tiny configs."""

import os

import numpy as np
import pytest

from tpurt.cli import main


def test_render_all_documented_intersectors(tmp_path):
    """--intersector choices documented == choices accepted and working
    (bvh_packet is covered by its own kernel tests; the jnp/pallas paths
    here run in interpret mode on CPU)."""
    for kind in ("auto", "brute", "bvh", "bvh_tile"):
        out = str(tmp_path / f"c_{kind}.png")
        rc = main([
            "render", "--config", "cornell", "--width", "32",
            "--height", "32", "--spp", "1", "--max-bounces", "0",
            "--intersector", kind, "--out", out,
        ])
        assert rc == 0 and os.path.exists(out)


@pytest.mark.parametrize("pipeline", ["mega", "staged", "wavefront"])
def test_render_all_documented_pipelines(tmp_path, pipeline):
    out = str(tmp_path / f"p_{pipeline}.png")
    rc = main([
        "render", "--config", "cornell_pt", "--width", "32",
        "--height", "32", "--spp", "2", "--spp-per-batch", "2",
        "--max-bounces", "1", "--pipeline", pipeline, "--out", out,
    ])
    assert rc == 0 and os.path.exists(out)


def test_checkpoint_resume_flags(tmp_path):
    ck = str(tmp_path / "state.npz")
    out1 = str(tmp_path / "a.png")
    rc = main([
        "render", "--config", "cornell", "--width", "32", "--height",
        "32", "--spp", "2", "--spp-per-batch", "2", "--max-bounces", "0",
        "--checkpoint", ck, "--out", out1,
    ])
    assert rc == 0 and os.path.exists(ck)
    out2 = str(tmp_path / "b.png")
    rc = main([
        "render", "--config", "cornell", "--width", "32", "--height",
        "32", "--spp", "4", "--spp-per-batch", "2", "--max-bounces", "0",
        "--resume", ck, "--out", out2,
    ])
    assert rc == 0 and os.path.exists(out2)


def test_animate_with_readback_chunk(tmp_path):
    out_dir = str(tmp_path / "frames")
    rc = main([
        "animate", "--config", "cornell", "--width", "32", "--height",
        "32", "--spp", "1", "--max-bounces", "0", "--frames", "3",
        "--readback-chunk", "2", "--out-dir", out_dir,
    ])
    assert rc == 0
    assert sorted(os.listdir(out_dir)) == [
        "frame_0000.png", "frame_0001.png", "frame_0002.png"
    ]


def test_export_subcommand(tmp_path):
    out = str(tmp_path / "cornell.glb")
    rc = main(["export", "--config", "cornell", "--out", out])
    assert rc == 0 and os.path.getsize(out) > 1000
    from tpurt.scene.loader import load_scene

    scene = load_scene(out)
    assert scene.num_triangles > 0


def test_info():
    assert main(["info", "--cpu"]) == 0


def test_sample_tile_shard_flags(tmp_path):
    """--sample-shards/--tile-shards route through the distributed
    staged pipeline on the virtual device mesh."""
    out = str(tmp_path / "sharded.png")
    rc = main([
        "render", "--config", "cornell_pt", "--width", "32", "--height",
        "16", "--spp", "2", "--spp-per-batch", "1", "--max-bounces", "1",
        "--pipeline", "staged", "--sample-shards", "2", "--tile-shards",
        "2", "--out", out,
    ])
    assert rc == 0 and os.path.exists(out)

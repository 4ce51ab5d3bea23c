"""G8 on hardware (VERDICT r2 #4): run the wavefront compaction pipeline
on the TPU in an EXPENDABLE subprocess and settle its status.

The wavefront pipeline (tpurt/render/wavefront.py) holds two Pallas
traversal calls inside a lax.while_loop — the program shape round 1
documented as miscompiling. Round 2 killed the "≥2 traversal calls" law
at the whole-batch shape (TPURT_FUSE_BOUNCES runs 6 traversal calls
fine), so the wavefront shape is now testable: either it earns a TPU
benchmark row, or it is demoted to a CPU oracle in PARITY.md.

Run: python benchmarks/ab_wavefront_tpu.py  (parent; child per pipeline)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CFG = dict(width=400, height=300, spp=4, spp_per_batch=2, max_bounces=2)


def child_main(pipeline: str) -> int:
    import numpy as np

    from tpurt.render import framebuffer as fb
    from tpurt.render import render_scene
    from tpurt.utils.config import get_config

    cfg = get_config("bunny", pipeline=pipeline,
                     intersector="bvh_tile", **CFG)
    t0 = time.perf_counter()
    state, stats = render_scene(cfg)
    wall = time.perf_counter() - t0
    img = np.asarray(fb.resolve(state))
    rec = {
        "pipeline": pipeline,
        "mrays_per_s": round(stats["mrays_per_s"], 3),
        "frame_s": round(stats["elapsed_s"], 3),
        "wall_s": round(wall, 1),
        "mean": float(img.mean()),
        "img_sum": float(img.sum()),
    }
    np.save(f"/tmp/wavefront_ab_{pipeline}.npy", img)
    print("AB_RESULT " + json.dumps(rec))
    return 0


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--_child":
        sys.exit(child_main(sys.argv[2]))
    out = {}
    for pipeline in ("staged", "wavefront"):
        r = subprocess.run(
            [sys.executable, __file__, "--_child", pipeline],
            capture_output=True, text=True, timeout=3600,
        )
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("AB_RESULT "):
                rec = json.loads(line[len("AB_RESULT "):])
        if rec is None:
            rec = {"pipeline": pipeline, "crashed": True,
                   "stderr_tail": (r.stderr.splitlines() or ["?"])[-1][:300]}
        out[pipeline] = rec
        print(json.dumps(rec))
    if all(not v.get("crashed") for v in out.values()):
        import numpy as np

        a = np.load("/tmp/wavefront_ab_staged.npy")
        b = np.load("/tmp/wavefront_ab_wavefront.npy")
        rmse = float(np.sqrt(np.mean((a - b) ** 2)))
        print(json.dumps({"rmse_staged_vs_wavefront": rmse}))


if __name__ == "__main__":
    main()

"""Per-stage TPU timings for bunny with the depoisoned path."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TPURT_DEBUG_STAGES"] = "1"
from tpurt.render import render_scene
from tpurt.utils.config import get_config

cfg = get_config("bunny", spp=4, spp_per_batch=2, pipeline="staged")
t0 = time.perf_counter()
state, stats = render_scene(cfg, readback_stats=False)
print(f"cold total {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
state, stats = render_scene(cfg, readback_stats=False)
print(f"warm total {time.perf_counter()-t0:.2f}s "
      f"{stats['mrays_per_s']:.2f} Mrays/s (est)")

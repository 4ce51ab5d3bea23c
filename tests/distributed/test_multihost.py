"""Multi-host wiring smoke test (SURVEY.md §5, VERDICT r2 missing #5).

Real multi-host hardware is unavailable on the dev box, so this covers
the single-host degenerate case: jax.distributed.initialize() with an
explicit 1-process cluster, then a render through the CLI path. Runs in
a SUBPROCESS — jax.distributed state is process-global and must not
leak into the rest of the suite.
"""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..", "..")

CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
from tpurt.parallel.mesh import init_multihost, make_render_mesh

pi, pc = init_multihost("localhost:12971", num_processes=1, process_id=0)
assert (pi, pc) == (0, 1), (pi, pc)
pi2, pc2 = init_multihost()  # idempotent second call
assert (pi2, pc2) == (0, 1)
assert len(jax.devices()) >= 1

from tpurt.cli import main
rc = main(["render", "--config", "cornell", "--width", "32",
           "--height", "24", "--spp", "1", "--multihost",
           "--coordinator", "localhost:12971", "--num-processes", "1",
           "--process-id", "0", "--out", "/tmp/mh.png"])
assert rc == 0
print("MULTIHOST_OK")
"""


def test_multihost_single_process_smoke():
    env = dict(os.environ)
    env.setdefault("TPURT_INTERPRET_PALLAS", "1")
    r = subprocess.run(
        [sys.executable, "-c", CHILD], capture_output=True, text=True,
        cwd=REPO, env=env, timeout=600,
    )
    assert "MULTIHOST_OK" in r.stdout, (r.stdout, r.stderr[-2000:])

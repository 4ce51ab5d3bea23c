"""Multi-chip parallelism (SURVEY.md §2.3 X1/X2).

The reference is a single-GPU, single-process program (SURVEY.md §2.3); its
only parallelism is the GPU's internal SIMT scheduling inside
``vkCmdTraceRaysKHR``. The TPU rebuild makes the scaling axes explicit:

  X1 tile data-parallelism:  the framebuffer's rows are sharded across the
      "tile" mesh axis; scene + BVH are replicated.
  X2 sample parallelism:     each "sample" shard renders the full tile set
      with an independent RNG stream; a ``psum`` over ICI merges the
      progressive sample sums (the distributed-communication-backend
      equivalent — XLA collectives, no NCCL/MPI, SURVEY.md §5).
  X3 in-chip wavefront:      SoA ray tiles inside the kernels (always on).
  X4 TP/PP/EP/CP/ring-attention have no referent here: a ray tracer has no
      weight matrices to shard (TP/PP), no sequence axis (SP/CP/ring
      attention/Ulysses) and no experts (EP). The honest equivalents of
      "scaling the long axis" are X1/X2 over rays × samples; this is by
      design, documented rather than faked (SURVEY.md §2.3 X4, §5).
"""

from tpurt.parallel.mesh import (
    make_render_mesh,
    render_batch_distributed,
)

__all__ = ["make_render_mesh", "render_batch_distributed"]

"""Pallas TPU kernels — the rebuild's native/device tier (SURVEY.md §2.2).

The reference's GLSL shader stages + hardware traversal map here:
  raygen (G1)        → jnp camera_rays feeding packet tiles (XLA fuses it)
  traversal (G2/G4)  → tpurt.kernels.packet — packet BVH walk, the hot core
  shading (G3/G5)    → tpurt.materials (dense VPU masked dispatch)
  compaction (G8/G9) → tpurt.render.wavefront (XLA sort/scan based)
  accumulate (G10)   → tpurt.render.framebuffer (XLA fused)

Only the traversal is a hand-written kernel: it is the one stage whose
access pattern (data-dependent tree walk) XLA cannot express efficiently;
everything else is measured to be memory- or launch-bound and is left to
the XLA fuser on purpose (SURVEY.md §7 "let XLA fuse").
"""

from tpurt.kernels.packet import make_packet_intersector  # noqa: F401

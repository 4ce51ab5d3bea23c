"""tpurt — a TPU-native ray-tracing framework.

Brand-new JAX/XLA/Pallas rebuild of the capability surface of the Vulkan
hardware-ray-tracing demo ``evopen/vk-ray-tracing`` (see SURVEY.md for the
full layer map and component inventory; the reference mount was empty this
round, so parity citations point at SURVEY.md / BASELINE.json rather than
reference file:line — see SURVEY.md §0).

Layer mapping (SURVEY.md §1):
  L1 platform bootstrap  -> JAX runtime + device mesh        (tpurt.parallel)
  L2 GPU resources       -> device arrays, SoA packing       (tpurt.scene.device)
  L3 scene + accel       -> scene/state API + on-device LBVH (tpurt.scene, tpurt.bvh)
  L4 RT pipeline + SBT   -> wavefront kernel loop            (tpurt.render, tpurt.kernels)
  L5 app/demo            -> CLI + RenderConfig presets       (tpurt.cli, tpurt.utils.config)
"""

__version__ = "0.1.0"

# Geometry correctness requires f32 matmuls: TPU matmul/einsum defaults to
# bf16 inputs, which corrupts ray/instance transforms in large scenes
# (Cornell's 555-unit coordinates lose ~3 decimal digits — reproduced as
# ~1e-3 relative hit-distance error vs the CPU oracle). The renderer has no
# throughput-critical matmuls, so this costs nothing.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "float32")
del _jax

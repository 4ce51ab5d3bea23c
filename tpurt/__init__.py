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

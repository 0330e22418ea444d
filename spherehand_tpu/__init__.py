"""spherehand_tpu — TPU-native self-supervised 3D hand-pose estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of melonwan/sphereHand
(reference mounted at /root/reference): a parametric sphere-mesh hand model with
differentiable rendering, a stacked-hourglass depth-to-pose CNN, a
self-supervision loss stack over multi-view depth data, and a data-parallel
training engine that runs as a single jitted program sharded over a TPU mesh.

Layer map (bottom-up; reference counterparts cited in each module):
  hand/      assets + forward kinematics + linear blend skinning
  ops/       rendering kernels (Pallas z-buffer rasterizer, sphere/heatmap
             renderers), soft-argmax, image noise/augmentation
  models/    hourglass CNN, pose VAE, pose denoiser, torch checkpoint import
  losses/    self-supervision stack (mutual projection, consistency, prior,
             collision, bone length, temporal) + multitask assembly
  data/      on-device synthetic pose sampler + NYU multi-view pipeline
  parallel/  device mesh + sharding policy (data-parallel over ICI)
  train/     jitted train/eval steps, engine, optimizer, checkpointing
  eval/      metrics (avg joint error, PCK curves), palm-pose adjustment
  viz/       depth-map / heatmap / skeleton visualization
"""

__version__ = "0.1.0"

from spherehand_tpu.constants import Constants  # noqa: F401

"""gd3d — TPU-native geometric-distillation framework for 3D-aware VLMs.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
kaist-cvml/3d-vlm-gd (arXiv:2506.09883): distilling 3D awareness from frozen
3D foundation-model teachers (MASt3R, VGGT) into a 2D CLIP ViT student via
sparse-correspondence AP loss, relative-depth losses and dense cost-volume KL.

Layout:
  core/     meshes, precision policy, typed configs, checkpointing
  ops/      pure-jnp geometry & loss ops (reference semantics)
  kernels/  Pallas TPU kernels for the hot ops
  models/   student ViT + CroCo/DUSt3R/MASt3R + VGGT model stacks (flax)
  teachers/ frozen-inference wrappers + torch->jax checkpoint converters
  distill/  keypoint pipeline, loss assembly, pjit train steps
  data/     host data pipeline (objaverse / scannet++ pair samplers)
  eval/     PF-PASCAL PCK, TAP-Vid tracking, OnePose pose, FiT3D baseline
  cli/      train / evaluate entry points
"""

__version__ = "0.1.0"

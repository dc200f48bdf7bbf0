"""oetr_tpu — a TPU-native image-matching & reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TencentYoutuResearch/ImageMatching-OETR (reference mounted read-only at
/root/reference): overlap estimation (OETR), local-feature extraction
(SuperPoint), matching (SuperGlue/LoFTR/NN), two-view geometry (batched
RANSAC essential matrix + pose recovery as XLA programs), benchmark
harnesses (MegaDepth / IMC / HPatches), and distributed training /
inference over `jax.sharding.Mesh`.

Layout (mirrors SURVEY.md §1 "Target layer map"):
  geometry/  — box algebra, projection/warp, epipolar, RANSAC pose
  ops/       — Pallas kernels + jnp reference ops (attention, Sinkhorn, NMS)
  models/    — OETR, SuperPoint, SuperGlue, LoFTR (flax.linen)
  parallel/  — mesh construction, sharding specs, collectives
  data/      — pair datasets, GT overlap boxes, static-shape bucketing
  training/  — pjit train loop, losses, validation, orbax checkpoints
  pipelines/ — overlap-guided matching pipeline + public api
  evalx/     — MegaDepth/IMC/HPatches metric harnesses
  sfm/       — COLMAP interop + bundle adjustment
"""

__version__ = "0.1.0"

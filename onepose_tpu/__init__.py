"""OnePose-TPU: a TPU-native one-shot object pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of OnePose
(CVPR 2022, reference implementation studied at /root/reference):

- Sparse object mapping: SuperPoint-class feature extraction, SuperGlue-class
  pair matching, known-pose multi-view triangulation, point filtering and
  per-point descriptor aggregation (replacing the reference's COLMAP
  subprocess pipeline with on-device batched geometry).
- One-shot 2D-3D matching: graph-attention (GATs) leaf aggregation +
  linear self/cross attention matcher with masked dual-softmax.
- Pose solving: batched EPnP + fixed-iteration RANSAC + Gauss-Newton
  refinement, fully jittable (replacing cv2.solvePnPRansac).
- Tracking: functional keyframe ring-buffer tracker with an on-device
  Levenberg-Marquardt sliding-window bundle adjustment (replacing DeepLM).
- Training: focal loss on the dual-softmax confidence matrix, data-parallel
  pjit over a device mesh, metric aggregation via collectives.

Design principles (deliberately different from the reference):
- Static shapes + validity masks everywhere; padding is a typed core concept.
- Whole-frame pipeline stays on device; no per-frame host sync.
- SPMD via one mesh abstraction; single chip is the 1x1 mesh special case.
"""

__version__ = "0.1.0"

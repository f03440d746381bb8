"""gdslam_tpu — a TPU-native dynamic RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GD-SLAM
(DynaSLAM / ORB-SLAM2 + dense-scene-flow dynamic masking): ORB pyramid
front-end as fused TPU kernels, per-pixel Mahalanobis scene-flow masking as a
single jitted transform, Gauss-Newton/LM pose & bundle adjustment on
fixed-shape map arenas, BoW place recognition on the MXU, and a Flax Mask
R-CNN for semantic masking — with batched multi-sequence scale-out over a
`jax.sharding.Mesh`.

Public API mirrors the reference's `ORB_SLAM2::System` (reference
include/System.h): see `gdslam_tpu.system.System`.
"""

__version__ = "0.1.0"

from gdslam_tpu.config import SlamConfig, CameraConfig, OrbConfig  # noqa: F401

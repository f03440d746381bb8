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

import os as _os

# Persistent XLA compilation cache: the fused per-frame programs take
# minutes to compile over the tunneled TPU (~300-400 s of warm-up per
# process, measured); caching them makes every subsequent process start in
# seconds. Opt out with GDSLAM_NO_COMPILE_CACHE=1. CPU runs (the test
# suite's virtual mesh) skip it: XLA:CPU AOT entries are pinned to the
# exact host machine features and reload with feature-mismatch warnings
# (observed: +prefer-no-scatter), and CPU compiles are local anyway.
if not _os.environ.get("GDSLAM_NO_COMPILE_CACHE") and \
        _os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
    import jax as _jax

    _cache_dir = _os.environ.get(
        "GDSLAM_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      "..", ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # Cache everything, including programs XLA considers "small": over
        # the tunnel even small compiles cost seconds of round trips.
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax without these flags
        pass

from gdslam_tpu.config import SlamConfig, CameraConfig, OrbConfig  # noqa: F401

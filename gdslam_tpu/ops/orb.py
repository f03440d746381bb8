"""ORB keypoint orientation + rBRIEF descriptors, batched for TPU.

Replaces the reference's IC_Angle (ORBextractor.cc:77-104) and
computeOrbDescriptor (ORBextractor.cc:108-147).

Design notes:
- Patches are gathered per keypoint with vmapped dynamic_slice; moments and
  descriptor taps are then dense [K, ...] math.
- The 256 sampling pairs are a deterministic seeded BRIEF pattern
  (Gaussian(0, (S/5)^2), the BRIEF-paper distribution) rather than the
  reference's learned `bit_pattern_31_` table: descriptors here never need to
  be bit-compatible with OpenCV's (matching, BoW vocabulary, and loop closure
  are all trained/computed in-framework), and an original pattern keeps the
  implementation clean-room. Pattern points are clipped to radius 13 so that
  any rotation stays inside the 31x31 patch.
- Rotation is continuous (per-keypoint sin/cos), sampling is
  round-to-nearest like the reference's cvRound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 31
HALF_PATCH = 15
N_BITS = 256


def _np_pattern(seed: int = 42, n_bits: int = N_BITS) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 2, 2))
    r = np.sqrt((pts ** 2).sum(-1, keepdims=True))
    pts = np.where(r > 13.0, pts * (13.0 / r), pts)
    return np.round(pts).astype(np.float32)  # [256, 2 taps, (x, y)]


BRIEF_PATTERN = jnp.asarray(_np_pattern())   # [256, 2, 2]


def _circular_mask_and_coords():
    """31x31 circular footprint + x/y coordinate grids for IC moments."""
    ys, xs = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    mask = (xs * xs + ys * ys) <= HALF_PATCH * HALF_PATCH
    return (jnp.asarray(mask, jnp.float32), jnp.asarray(xs, jnp.float32),
            jnp.asarray(ys, jnp.float32))


_IC_MASK, _IC_X, _IC_Y = _circular_mask_and_coords()


def gather_patches(img: jnp.ndarray, uv: jnp.ndarray, size: int = PATCH) -> jnp.ndarray:
    """Gather [K, size, size] patches centered at integer-rounded uv [K, 2]."""
    H, W = img.shape
    half = size // 2
    u = jnp.round(uv[:, 0]).astype(jnp.int32) - half
    v = jnp.round(uv[:, 1]).astype(jnp.int32) - half
    u = jnp.clip(u, 0, W - size)
    v = jnp.clip(v, 0, H - size)

    def slice_one(vu):
        return jax.lax.dynamic_slice(img, (vu[0], vu[1]), (size, size))

    return jax.vmap(slice_one)(jnp.stack([v, u], axis=1))


def ic_angle(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation (radians) per keypoint.

    Same moments as IC_Angle (ORBextractor.cc:77-104): angle =
    atan2(m01, m10) over the circular 31x31 patch.
    """
    patches = gather_patches(img, uv)           # [K, 31, 31]
    w = patches * _IC_MASK
    m10 = jnp.sum(w * _IC_X, axis=(1, 2))
    m01 = jnp.sum(w * _IC_Y, axis=(1, 2))
    return jnp.arctan2(m01, m10)


def brief_descriptors(img_blurred: jnp.ndarray, uv: jnp.ndarray,
                      angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated-BRIEF descriptors, packed [K, 32] uint8.

    Bit i = I(p + R(angle) q_i1) < I(p + R(angle) q_i2), matching the
    comparison sense of computeOrbDescriptor (ORBextractor.cc:108-147).
    """
    ca, sa = jnp.cos(angle), jnp.sin(angle)     # [K]
    # Rotate pattern: [K, 256, 2, 2]
    px = BRIEF_PATTERN[None, :, :, 0]
    py = BRIEF_PATTERN[None, :, :, 1]
    rx = px * ca[:, None, None] - py * sa[:, None, None]
    ry = px * sa[:, None, None] + py * ca[:, None, None]
    su = jnp.round(uv[:, None, None, 0] + rx).astype(jnp.int32)
    sv = jnp.round(uv[:, None, None, 1] + ry).astype(jnp.int32)
    H, W = img_blurred.shape
    su = jnp.clip(su, 0, W - 1)
    sv = jnp.clip(sv, 0, H - 1)
    flat = img_blurred.reshape(-1)
    vals = flat[(sv * W + su).reshape(uv.shape[0], N_BITS, 2)]
    bits = (vals[..., 0] < vals[..., 1])        # [K, 256] bool
    return pack_bits(bits)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., 256] bool -> [..., 32] uint8 (little-endian bit order)."""
    b = bits.reshape(bits.shape[:-1] + (32, 8)).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., 32] uint8 -> [..., 256] bool."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    b = (packed[..., None] >> shifts) & jnp.uint8(1)
    return b.reshape(packed.shape[:-1] + (256,)).astype(jnp.bool_)


def descriptors_pm1(packed: jnp.ndarray, valid=None) -> jnp.ndarray:
    """[..., 32] uint8 -> [..., 256] int8 in {-1, +1} for MXU Hamming.

    Invalid rows (valid == False) become all-zero so their dot products
    vanish instead of matching.
    """
    pm1 = jnp.where(unpack_bits(packed), jnp.int8(1), jnp.int8(-1))
    if valid is not None:
        pm1 = jnp.where(valid[..., None], pm1, jnp.int8(0))
    return pm1


def feature_quotas(n_features: int, n_levels: int, scale: float) -> list[int]:
    """Per-level keypoint budget, geometric in 1/scale — same scheme as the
    reference ORBextractor ctor (ORBextractor.cc:410)."""
    f = 1.0 / scale
    first = n_features * (1 - f) / (1 - f ** n_levels)
    quotas, total = [], 0
    for lv in range(n_levels - 1):
        q = int(round(first * f ** lv))
        quotas.append(q)
        total += q
    quotas.append(max(n_features - total, 0))
    return quotas

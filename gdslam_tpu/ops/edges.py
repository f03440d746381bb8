"""Depth-map geometric edge detection via surface normals.

Behavioral equivalent of GeoMaskMaker::GetEdge (reference
GeoMaskMaker.cc:854-963): backproject the depth map, estimate per-pixel
normals from cross products of neighboring 3D points, then flag pixels where
neighbors exhibit either a depth-discontinuity/concavity signal (phi_d: the
projection of the neighbor offset on the neighbor normal) or a strong
normal change (phi_c), with the reference's combination rule
`max|phi_d| + 0.05 * max(phi_c) > 0.04`.

GeoMaskMaker uses these edges to reject unstable depth pixels before the
Mahalanobis test (GeoMaskMaker.cc:198-199, 224-228).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gdslam_tpu.config import CameraConfig
from gdslam_tpu.core import camera as cam_ops

EDGE_THRESHOLD = 0.04
PHI_C_WEIGHT = 0.05


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    return jnp.roll(x, (-dy, -dx), axis=(0, 1))


@partial(jax.jit, static_argnums=(1,))
def depth_edges(depth: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """[H, W] bool: True where the depth surface has a geometric edge."""
    H, W = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    P = cam_ops.backproject(jnp.stack([u, v], -1), depth, cam)   # [H, W, 3]

    # Normals from central-difference cross products.
    dPdu = 0.5 * (_shift(P, 0, 1) - _shift(P, 0, -1))
    dPdv = 0.5 * (_shift(P, 1, 0) - _shift(P, -1, 0))
    n = jnp.cross(dPdu, dPdv)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

    neighbors = [(-1, 0), (1, 0), (0, -1), (0, 1),
                 (-1, -1), (-1, 1), (1, -1), (1, 1)]
    phi_d_max = jnp.zeros((H, W))
    phi_c_max = jnp.zeros((H, W))
    valid = depth > 0
    for dy, dx in neighbors:
        Pn = _shift(P, dy, dx)
        nn = _shift(n, dy, dx)
        vn = _shift(valid, dy, dx)
        diff = Pn - P
        dist = jnp.maximum(jnp.linalg.norm(diff, axis=-1), 1e-9)
        # phi_d: distance of the neighbor offset along a surface normal
        # (depth-jump/concavity signal). Project on BOTH normals — at a
        # discontinuity the central-difference normal of one side is
        # corrupted and can be near-orthogonal to the jump.
        proj = jnp.maximum(jnp.abs(jnp.einsum("hwi,hwi->hw", diff, nn)),
                           jnp.abs(jnp.einsum("hwi,hwi->hw", diff, n)))
        phi_d = proj / dist * jnp.minimum(dist, 1.0)
        phi_c = 1.0 - jnp.einsum("hwi,hwi->hw", n, nn)
        both = valid & vn
        # Direct depth-discontinuity term: central-difference normals are
        # corrupted on BOTH sides of a jump, so the normal-projection signal
        # alone can miss it. A neighbor depth step beyond the local noise
        # band (2% of depth + 2 cm) is an edge outright.
        dz = jnp.abs(_shift(depth, dy, dx) - depth)
        jump = dz > (0.02 * depth + 0.02)
        phi_d = jnp.maximum(phi_d, jnp.where(jump, 1.0, 0.0))
        phi_d_max = jnp.maximum(phi_d_max, jnp.where(both, phi_d, 0.0))
        phi_c_max = jnp.maximum(phi_c_max, jnp.where(both, phi_c, 0.0))
        # a missing-depth neighbor is itself an edge
        phi_d_max = jnp.maximum(phi_d_max,
                                jnp.where(valid & ~vn, 1.0, 0.0))

    edge = (phi_d_max + PHI_C_WEIGHT * phi_c_max) > EDGE_THRESHOLD
    # Rolled neighbors wrap at the image border; suppress the artifact band.
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inner = (ys >= 2) & (ys < H - 2) & (xs >= 2) & (xs < W - 2)
    return edge & valid & inner

"""Pinhole camera model with radial-tangential distortion.

The reference undistorts keypoints with `cv::undistortPoints`
(Frame.cc:576) and precomputes a full-frame undistortion LUT at startup
(GeoMaskMaker.cc:39-70). Here both become pure JAX: distortion is the
closed-form Brown-Conrady forward model, undistortion is a fixed-iteration
Newton/fixed-point inverse (jit/vmap friendly), and the full-frame LUT is
built once per camera as a [H, W, 2] array.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gdslam_tpu.config import CameraConfig


def intrinsic_matrix(cam: CameraConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([[cam.fx, 0.0, cam.cx],
                      [0.0, cam.fy, cam.cy],
                      [0.0, 0.0, 1.0]], dtype=dtype)


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply Brown-Conrady distortion to normalized coords [..., 2].

    dist = [k1, k2, p1, p2, k3] (OpenCV ordering).
    """
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xy_d: jnp.ndarray, dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert distortion by fixed-point iteration (cv::undistortPoints style)."""
    def body(_, xy):
        k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x_new = (xy_d[..., 0] - dx) / radial
        y_new = (xy_d[..., 1] - dy) / radial
        return jnp.stack([x_new, y_new], axis=-1)
    return jax.lax.fori_loop(0, iters, body, xy_d)


def dist_coeffs(cam: CameraConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3], dtype=dtype)


def undistort_points(uv: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Undistort pixel coords [..., 2] -> undistorted pixel coords.

    Equivalent to Frame::UndistortKeyPoints (Frame.cc:576): undistortPoints
    with P = K, so output stays in pixel units.
    """
    if not cam.has_distortion:
        return uv
    d = dist_coeffs(cam, uv.dtype)
    xy_d = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                      (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    xy = undistort_normalized(xy_d, d)
    return jnp.stack([xy[..., 0] * cam.fx + cam.cx,
                      xy[..., 1] * cam.fy + cam.cy], axis=-1)


@partial(jax.jit, static_argnums=(0,))
def undistort_lut(cam: CameraConfig) -> jnp.ndarray:
    """[H, W, 2] undistorted pixel coords for every pixel.

    The reference builds the same table once in the GeoMaskMaker ctor
    (GeoMaskMaker.cc:39-70) to avoid per-frame undistortPoints calls.
    """
    H, W = cam.height, cam.width
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    return undistort_points(jnp.stack([u, v], axis=-1), cam)


def backproject(uv: jnp.ndarray, z: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Pixel coords + depth -> camera-frame 3D points [..., 3]."""
    x = (uv[..., 0] - cam.cx) / cam.fx * z
    y = (uv[..., 1] - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1)


def project(pts: jnp.ndarray, cam: CameraConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame 3D points -> (pixel coords [..., 2], depth [...])."""
    z = pts[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = pts[..., 0] / z_safe * cam.fx + cam.cx
    v = pts[..., 1] / z_safe * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1), z

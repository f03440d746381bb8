"""Synthetic RGB-D sequence generator with exact ground truth.

The reference is driven by TUM RGB-D sequences (Examples/RGB-D/rgbd_tum.cc);
no dataset ships with either repo and this environment has no network, so
this module provides the dataset for end-to-end tests, ATE evaluation, and
benchmarks: a ray-cast textured box room (closed-form ray/plane hits, so
RGB-D frames are perfectly multi-view consistent) with a smooth TUM-walking-
style camera trajectory, plus an optional moving textured sphere that plays
the role of the dynamic object for GeoMaskMaker / Geometry tests.

Everything is pure JAX and jittable; rendering a 640x480 frame is one fused
program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from gdslam_tpu.config import CameraConfig
from gdslam_tpu.core import lie


class RenderedFrame(NamedTuple):
    gray: jnp.ndarray       # [H, W] float32 in [0, 255]
    depth: jnp.ndarray      # [H, W] float32 meters (0 = invalid)
    rgb: jnp.ndarray        # [H, W, 3] float32 in [0, 255]
    dyn_mask: jnp.ndarray   # [H, W] bool, True where the dynamic object is
    T_wc: jnp.ndarray       # [4, 4] ground-truth camera-to-world pose


def _hash2(ix: jnp.ndarray, iy: jnp.ndarray, seed: float) -> jnp.ndarray:
    """Deterministic lattice hash -> [0, 1)."""
    h = jnp.sin(ix * 127.1 + iy * 311.7 + seed * 74.7) * 43758.5453
    return h - jnp.floor(h)


def value_noise(x: jnp.ndarray, y: jnp.ndarray, seed: float = 0.0,
                octaves: int = 4) -> jnp.ndarray:
    """Multi-octave value noise in [0, 1] — the wall/floor texture."""
    out = jnp.zeros_like(x)
    amp, freq, norm = 1.0, 1.0, 0.0
    for o in range(octaves):
        xf, yf = x * freq, y * freq
        ix, iy = jnp.floor(xf), jnp.floor(yf)
        fx, fy = xf - ix, yf - iy
        fx = fx * fx * (3 - 2 * fx)
        fy = fy * fy * (3 - 2 * fy)
        v00 = _hash2(ix, iy, seed + o)
        v10 = _hash2(ix + 1, iy, seed + o)
        v01 = _hash2(ix, iy + 1, seed + o)
        v11 = _hash2(ix + 1, iy + 1, seed + o)
        v = (v00 * (1 - fx) + v10 * fx) * (1 - fy) + (v01 * (1 - fx) + v11 * fx) * fy
        out = out + amp * v
        norm += amp
        amp *= 0.55
        freq *= 2.3
    return out / norm


# Box room: camera starts near origin looking +z. Planes: (normal, offset,
# texture seed); point p is on plane when n . p = offset.
_N_BACK = (0.25, 0.15, 0.956)       # tilted back wall: depth gradient in view
_PLANES = (
    (_N_BACK, 2.8, 1.0),            # tilted back wall, ~2.9 m on axis
    ((0.0, 1.0, 0.0), 1.25, 2.0),   # floor      y = 1.25 (y down in cam frame)
    ((0.0, 1.0, 0.0), -1.25, 3.0),  # ceiling    y = -1.25
    ((1.0, 0.0, 0.0), 1.7, 4.0),    # right wall x = 1.7
    ((1.0, 0.0, 0.0), -1.7, 5.0),   # left wall  x = -1.7
    ((0.12, -0.08, 0.989), -2.3, 6.0),  # tilted front wall z ~= -2.3 (behind
                                        # the start pose; only visible to
                                        # looking-backwards trajectories such
                                        # as the loop-closure circuit)
)

# Static clutter: textured spheres at varied depths so every viewpoint sees
# depth diversity (a fronto-parallel constant-depth wall alone makes lateral
# translation + rotation a near-gauge-freedom for any SLAM system).
_STATIC_SPHERES = (
    ((-0.7, 0.45, 1.6), 0.28, 11.0),
    ((0.8, -0.35, 2.0), 0.33, 12.0),
    ((0.1, 0.7, 1.3), 0.22, 13.0),
    ((-0.9, -0.6, 2.3), 0.38, 14.0),
    ((0.55, 0.5, 2.45), 0.3, 15.0),
    ((-0.15, -0.2, 1.05), 0.16, 16.0),
    # back hemisphere (z < 0): depth diversity for looking-backwards views
    ((0.6, 0.4, -1.4), 0.3, 17.0),
    ((-0.75, -0.3, -1.8), 0.35, 18.0),
    ((0.05, 0.55, -0.9), 0.2, 19.0),
    ((-0.4, 0.1, -2.0), 0.28, 20.0),
    # side pockets near the left/right walls for grazing-view anchoring
    ((1.3, 0.2, 0.6), 0.24, 21.0),
    ((-1.25, -0.4, 0.9), 0.26, 22.0),
)

SPHERE_RADIUS = 0.35


def gt_pose(frame_idx, fps: float = 30.0) -> jnp.ndarray:
    """Ground-truth T_wc: smooth sinusoidal translation + gentle rotation,
    fr3_walking_xyz-like (dominant xyz translation, mild look-around)."""
    t = jnp.asarray(frame_idx, jnp.float32) / fps
    trans = jnp.stack([
        0.35 * jnp.sin(0.9 * t),
        0.15 * jnp.sin(0.6 * t + 0.5),
        0.25 * jnp.sin(0.45 * t + 1.1),
    ])
    rot = jnp.stack([
        0.04 * jnp.sin(0.5 * t + 0.3),
        0.06 * jnp.sin(0.4 * t),
        0.03 * jnp.sin(0.7 * t + 0.9),
    ])
    return lie.se3_exp(jnp.concatenate([trans, rot]))


def gt_pose_loop(frame_idx, n_frames: int) -> jnp.ndarray:
    """Closed-loop revisit trajectory for loop-closure tests: a full yaw
    circuit with a small orbit, returning exactly to the initial view at
    frame n_frames (fr2_desk-style revisit; BASELINE config 4)."""
    th = 2.0 * jnp.pi * jnp.asarray(frame_idx, jnp.float32) / n_frames
    trans = jnp.stack([0.25 * jnp.sin(th), 0.05 * jnp.sin(2 * th),
                       0.15 * (1 - jnp.cos(th))])
    rot = jnp.stack([0.03 * jnp.sin(2 * th), th, jnp.zeros_like(th)])
    # compose yaw exactly (se3_exp couples trans/rot; keep it simple: build
    # R_y(th) directly with the orbital translation)
    cy, sy = jnp.cos(rot[1]), jnp.sin(rot[1])
    cx, sx = jnp.cos(rot[0]), jnp.sin(rot[0])
    Ry = jnp.asarray([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    Rx = jnp.asarray([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    T = jnp.eye(4).at[:3, :3].set(Ry @ Rx).at[:3, 3].set(trans)
    return T


def gt_pose_loop_mono(frame_idx, n_frames: int) -> jnp.ndarray:
    """Closed-loop revisit trajectory that is MONOCULAR-friendly: a wide
    lateral oval sweep (up to ~1.8 m of translation) with only a mild
    look-around yaw (+-0.35 rad), looking at the textured back wall the
    whole time. Mono needs parallax to triangulate — the yaw-circuit
    `gt_pose_loop` is rotation-dominant and structurally untrackable with
    one camera (no baseline), exactly as for the reference's mono mode."""
    th = 2.0 * jnp.pi * jnp.asarray(frame_idx, jnp.float32) / n_frames
    c = jnp.stack([0.9 * jnp.sin(th), 0.06 * jnp.sin(2.0 * th),
                   0.30 * (1.0 - jnp.cos(th))])
    yaw = 0.35 * jnp.sin(th)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    Ry = jnp.asarray([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    return jnp.eye(4).at[:3, :3].set(Ry).at[:3, 3].set(c)


def sphere_center(frame_idx, fps: float = 30.0) -> jnp.ndarray:
    """Dynamic object: sphere sweeping across the view."""
    t = jnp.asarray(frame_idx, jnp.float32) / fps
    return jnp.stack([
        0.7 * jnp.sin(1.7 * t),
        0.3 * jnp.sin(1.3 * t + 0.7) + 0.2,
        1.9 + 0.3 * jnp.sin(0.9 * t + 0.2),
    ])


@partial(jax.jit, static_argnums=(1, 2, 3))
def render(T_wc: jnp.ndarray, cam: CameraConfig, with_dynamic: bool = True,
           fps: float = 30.0, frame_idx=0) -> RenderedFrame:
    """Ray-cast one RGB-D frame from pose T_wc."""
    H, W = cam.height, cam.width
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    # Camera-frame ray dirs with z = 1 so camera depth == ray parameter s.
    d_cam = jnp.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy,
                       jnp.ones_like(u)], axis=-1)
    R, o = T_wc[:3, :3], T_wc[:3, 3]
    d = jnp.einsum("ij,hwj->hwi", R, d_cam, precision=jax.lax.Precision.HIGHEST)

    best_s = jnp.full((H, W), 1e9)
    best_tex = jnp.zeros((H, W))
    best_tint = jnp.ones((H, W, 3))
    for (n, off, seed) in _PLANES:
        n_arr = jnp.asarray(n) / np.linalg.norm(n)
        denom = jnp.einsum("hwi,i->hw", d, n_arr)
        s = (off - jnp.dot(o, n_arr)) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        p = o[None, None] + s[..., None] * d
        # plane-local 2D coords for texturing: use the two axes most
        # orthogonal to the normal
        ax = int(np.argmax(np.abs(n)))
        a1, a2 = [i for i in range(3) if i != ax]
        lx, ly = p[..., a1], p[..., a2]
        tex = value_noise(lx * 3.1, ly * 3.1, seed)
        hit = (s > 0.05) & (s < best_s)
        best_tex = jnp.where(hit, tex, best_tex)
        tint = jnp.asarray([0.9 + 0.1 * seed / 5.0, 1.0 - 0.08 * seed / 5.0, 0.85])
        best_tint = jnp.where(hit[..., None], tint[None, None], best_tint)
        best_s = jnp.where(hit, s, best_s)

    def add_sphere(state, c, radius, seed, tint):
        best_s, best_tex, best_tint = state
        oc = o - c
        b = jnp.einsum("hwi,i->hw", d, oc)
        dnorm2 = jnp.sum(d * d, axis=-1)
        disc = b * b - dnorm2 * (jnp.dot(oc, oc) - radius ** 2)
        s_sph = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / dnorm2
        hit = (disc > 0) & (s_sph > 0.05) & (s_sph < best_s)
        p = o[None, None] + s_sph[..., None] * d
        rel = p - c
        tex_s = value_noise(rel[..., 0] * 14.0 + 9.0, rel[..., 1] * 14.0, seed)
        best_tex = jnp.where(hit, tex_s, best_tex)
        best_tint = jnp.where(hit[..., None], jnp.asarray(tint)[None, None],
                              best_tint)
        best_s = jnp.where(hit, s_sph, best_s)
        return (best_s, best_tex, best_tint), hit

    state = (best_s, best_tex, best_tint)
    for (c, r, seed) in _STATIC_SPHERES:
        state, _ = add_sphere(state, jnp.asarray(c), r, seed,
                              (0.8, 0.9, 1.0))

    dyn_mask = jnp.zeros((H, W), jnp.bool_)
    if with_dynamic:
        c = sphere_center(frame_idx, fps)
        state, dyn_mask = add_sphere(state, c, SPHERE_RADIUS, 7.0,
                                     (1.0, 0.75, 0.7))
    best_s, best_tex, best_tint = state

    shade = 40.0 + 190.0 * best_tex
    rgb = jnp.clip(shade[..., None] * best_tint, 0, 255)
    gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    depth = jnp.where(best_s < 1e8, best_s, 0.0)
    return RenderedFrame(gray=gray, depth=depth, rgb=rgb, dyn_mask=dyn_mask,
                         T_wc=T_wc)


def render_frame(frame_idx: int, cam: CameraConfig, with_dynamic: bool = True,
                 fps: float = 30.0) -> RenderedFrame:
    return render(gt_pose(frame_idx, fps), cam, with_dynamic, fps,
                  frame_idx=frame_idx)


def gt_trajectory(n_frames: int, fps: float = 30.0) -> jnp.ndarray:
    """[N, 4, 4] ground-truth camera-to-world poses."""
    return jax.vmap(lambda i: gt_pose(i, fps))(jnp.arange(n_frames))

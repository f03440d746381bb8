"""DynaSLAM Geometry module: multi-view dynamic detection + inpainting.

Re-design of the reference Geometry class (include/Geometry.h,
src/Geometry.cc) — the DynaSLAM side of the masking stack:

- 20-slot keyframe ring DB (`GeometricModelUpdateDB`, Geometry.cc:48-53,
  985-1001; MAX_DB_SIZE=20 Geometry.h:19) holding gray/depth/mask/pose.
- Reference-frame selection: the 5 DB frames most distant from the current
  pose by 0.7*|dt| + 0.3*|deuler| (`GetRefFrames`, Geometry.cc:55-97,
  MAX_REF_FRAMES=5).
- `ExtractDynPoints` (Geometry.cc:100-412) becomes a dense per-pixel test:
  every valid ref-frame pixel is reprojected into the current view; where
  the predicted depth exceeds the observed window-minimum depth by more
  than 0.6 m (mDepthThreshold, Geometry.cc:373) on a locally-flat patch
  (41x41 depth variance < 0.001, mVarThreshold :377), the observed pixel is
  flagged dynamic. The (2*20+1)^2 occlusion search window (:1036) is one
  min-pool; the per-keypoint C++ loops vanish.
- `DepthRegionGrowing` (Geometry.cc:415-450): bounded flood fill on depth
  (threshold 0.20) from the dynamic seeds + 15 px dilation.
- `CombineMasks` (Geometry.cc:454-468): OR fusion with the semantic mask.
- `InpaintFrames`/`FillRGBD` (Geometry.cc:478-945): all static pixels of the
  DB frames are forward-composited into the current view with min-depth
  occlusion (MIN_DEPTH_THRESHOLD=0.2, Geometry.h:22), filling mask==0
  holes of the current RGB-D frame.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gdslam_tpu.config import SlamConfig
from gdslam_tpu.core import camera as cam_ops
from gdslam_tpu.core import lie
from gdslam_tpu.frontend.frame import dilate_mask
from gdslam_tpu.ops import image as image_ops

_PREC = jax.lax.Precision.HIGHEST


class GeometryDB(NamedTuple):
    gray: jnp.ndarray    # [D, H, W]
    depth: jnp.ndarray   # [D, H, W]
    mask: jnp.ndarray    # [D, H, W] 1=static
    rgb: jnp.ndarray     # [D, H, W, 3]
    pose: jnp.ndarray    # [D, 4, 4] T_cw
    valid: jnp.ndarray   # [D]
    cursor: jnp.ndarray  # scalar int32


def new_db(size: int, height: int, width: int) -> GeometryDB:
    return GeometryDB(
        gray=jnp.zeros((size, height, width)),
        depth=jnp.zeros((size, height, width)),
        mask=jnp.ones((size, height, width)),
        rgb=jnp.zeros((size, height, width, 3)),
        pose=jnp.tile(jnp.eye(4), (size, 1, 1)),
        valid=jnp.zeros(size, bool),
        cursor=jnp.asarray(0, jnp.int32),
    )


@jax.jit
def db_insert(db: GeometryDB, gray, depth, mask, rgb, T_cw) -> GeometryDB:
    """Ring insertion (GeometricModelUpdateDB, Geometry.cc:985-1001)."""
    i = db.cursor % db.valid.shape[0]
    return db._replace(
        gray=db.gray.at[i].set(gray),
        depth=db.depth.at[i].set(depth),
        mask=db.mask.at[i].set(mask),
        rgb=db.rgb.at[i].set(rgb),
        pose=db.pose.at[i].set(T_cw),
        valid=db.valid.at[i].set(True),
        cursor=db.cursor + 1,
    )


def _pose_distance(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """0.7*|dt| + 0.3*|deuler| (GetRefFrames, Geometry.cc:55-97)."""
    dt = jnp.linalg.norm(T_a[..., :3, 3] - T_b[..., :3, 3], axis=-1)
    de = jnp.linalg.norm(
        lie.rotm_to_euler(T_a[..., :3, :3]) - lie.rotm_to_euler(T_b[..., :3, :3]),
        axis=-1)
    return 0.7 * dt + 0.3 * de


def _min_pool(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable min over a size x size window, ignoring zeros (invalid)."""
    big = jnp.where(x > 0, x, jnp.inf)
    y = -jax.lax.reduce_window(-big, -jnp.inf, jax.lax.max, (size, 1), (1, 1), "SAME")
    y = -jax.lax.reduce_window(-y, -jnp.inf, jax.lax.max, (1, size), (1, 1), "SAME")
    return jnp.where(jnp.isfinite(y), y, 0.0)


def _box_mean(x: jnp.ndarray, size: int) -> jnp.ndarray:
    w = jnp.ones(size) / size
    H, W = x.shape
    y = jnp.pad(x, ((size // 2, size // 2), (0, 0)), mode="edge")
    y = sum(w[i] * jax.lax.slice_in_dim(y, i, i + H, axis=0) for i in range(size))
    y = jnp.pad(y, ((0, 0), (size // 2, size // 2)), mode="edge")
    return sum(w[i] * jax.lax.slice_in_dim(y, i, i + W, axis=1) for i in range(size))


@partial(jax.jit, static_argnums=(3,))
def extract_dynamic_seeds(db: GeometryDB, cur_depth: jnp.ndarray,
                          T_cw: jnp.ndarray, cfg: SlamConfig) -> jnp.ndarray:
    """Dense ExtractDynPoints: [H, W] bool seed map in the current view."""
    cam = cfg.camera
    g = cfg.geometry
    H, W = cam.height, cam.width
    D = db.valid.shape[0]

    # Pick the MAX_REF_FRAMES most-distant valid DB frames.
    dist = _pose_distance(db.pose, T_cw[None])
    score = jnp.where(db.valid, dist, -1.0)
    _, ref_ids = jax.lax.top_k(score, g.max_ref_frames)
    ref_ok = score[ref_ids] > 0

    # Window-minimum of current depth = the "occluding depth" search
    # ((2*20+1)^2 window, Geometry.cc:1036). The reference hardcodes the
    # radii for 640x480; scale them with resolution.
    scale = max(cam.width / 640.0, 1.0 / 8.0)
    radius = max(int(round(g.window_radius * scale)), 2)
    win = 2 * radius + 1
    cur_min_depth = _min_pool(cur_depth, win)
    # Local flatness: variance of current depth over the 41x41-equivalent
    # patch < var_threshold.
    vwin = 2 * max(int(round(20 * scale)), 2) + 1
    mean = _box_mean(cur_depth, vwin)
    var = _box_mean(cur_depth * cur_depth, vwin) - mean * mean

    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    uv = jnp.stack([u, v], -1)

    def one_ref(ref_idx, ok):
        z_ref = db.depth[ref_idx]
        T_ref = db.pose[ref_idx]
        m_ref = db.mask[ref_idx]
        X_ref = cam_ops.backproject(uv, z_ref, cam)
        T_rel = T_cw @ lie.se3_inverse(T_ref)          # cur <- ref
        X_cur = lie.se3_apply(T_rel, X_ref)
        uv_c, z_proj = cam_ops.project(X_cur, cam)
        in_img = (uv_c[..., 0] >= 0) & (uv_c[..., 0] < W - 1) & \
                 (uv_c[..., 1] >= 0) & (uv_c[..., 1] < H - 1) & (z_proj > 0)
        # Parallax filter < 30 deg (Geometry.cc:158,176): angle between the
        # viewing rays of ref and cur cameras to the point.
        o_ref = -jnp.einsum("ji,j->i", T_ref[:3, :3], T_ref[:3, 3], precision=_PREC)
        o_cur = -jnp.einsum("ji,j->i", T_cw[:3, :3], T_cw[:3, 3], precision=_PREC)
        X_w = lie.se3_apply(lie.se3_inverse(T_ref), X_ref)
        r1 = X_w - o_ref
        r2 = X_w - o_cur
        cosang = jnp.einsum("hwi,hwi->hw", r1, r2, precision=_PREC) / \
            jnp.maximum(jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)
        low_parallax = cosang > jnp.cos(jnp.deg2rad(g.parallax_deg))
        valid = ok & in_img & (z_ref > 0) & (z_ref < 6.0) & (m_ref > 0.5) & \
            low_parallax
        z_obs = image_ops.bilinear_sample(cur_min_depth, uv_c)
        var_at = image_ops.bilinear_sample(var, uv_c)
        dyn = valid & (z_proj - z_obs > g.depth_threshold) & (z_obs > 0) & \
            (var_at < g.var_threshold)
        # The projected pixel itself must be the occluder (not merely have
        # an occluder somewhere in its window).
        own_depth = image_ops.bilinear_sample(cur_depth, uv_c)
        dyn = dyn & (own_depth > 0) & (z_proj - own_depth > g.depth_threshold)
        # Scatter the evidence at the projected current-view location.
        ui = jnp.clip(jnp.round(uv_c[..., 0]).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(uv_c[..., 1]).astype(jnp.int32), 0, H - 1)
        seed = jnp.zeros((H, W), bool).at[vi.reshape(-1), ui.reshape(-1)].max(
            dyn.reshape(-1))
        return seed, ok

    # Vote across reference frames: a moving object is occluded-inconsistent
    # against EVERY reference view (it was elsewhere in all of them), while
    # static-occlusion parallax bands are only flagged by the large-baseline
    # references. Requiring a majority kills the static false positives.
    votes = jnp.zeros((H, W), jnp.int32)
    n_refs = jnp.asarray(0, jnp.int32)
    for k in range(g.max_ref_frames):
        seed, ok = one_ref(ref_ids[k], ref_ok[k])
        votes = votes + seed.astype(jnp.int32)
        n_refs = n_refs + ok.astype(jnp.int32)
    need = jnp.minimum(3, jnp.maximum(n_refs, 1))
    seeds = votes >= need
    # Density filter: genuinely dynamic surfaces produce CLUSTERS of seeds
    # (every reprojected ref pixel over the object agrees); isolated seeds
    # are pose-error/boundary noise, and a single stray seed can flood-fill
    # a large smooth-depth background band in the region-growing stage.
    density = jax.lax.reduce_window(seeds.astype(jnp.int32), 0,
                                    jax.lax.add, (5, 5), (1, 1), "SAME")
    return seeds & (density >= 5)


@partial(jax.jit, static_argnums=(2, 3, 4))
def depth_region_growing(seeds: jnp.ndarray, depth: jnp.ndarray,
                         threshold: float = 0.20, iters: int = 64,
                         dilation: int = 15) -> jnp.ndarray:
    """DepthRegionGrowing (Geometry.cc:415-450): bounded flood fill where a
    4-neighbor of the region has depth within `threshold`, then dilation."""
    # Each region pixel carries its originating seed depth; growth requires
    # the new pixel to stay within `threshold` of that seed depth as well as
    # of its neighbor. Pure neighbor-chaining (the naive flood fill) drifts
    # across smooth surfaces and floods the background.
    seed0 = seeds & (depth > 0)
    init = (seed0, jnp.where(seed0, depth, 0.0))

    def body(_, state):
        region, sdepth = state
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb_region = jnp.roll(region, (dy, dx), (0, 1))
            nb_depth = jnp.roll(depth, (dy, dx), (0, 1))
            nb_seed = jnp.roll(sdepth, (dy, dx), (0, 1))
            grow = nb_region & ~region & (depth > 0) & \
                (jnp.abs(depth - nb_depth) < threshold) & \
                (jnp.abs(depth - nb_seed) < 1.5 * threshold)
            sdepth = jnp.where(grow, nb_seed, sdepth)
            region = region | grow
        return region, sdepth

    region, _ = jax.lax.fori_loop(0, iters, body, init)
    return dilate_mask(region, dilation)


def combine_masks(sem_mask: jnp.ndarray, geo_dynamic: jnp.ndarray) -> jnp.ndarray:
    """CombineMasks (Geometry.cc:454-468): static = semantic AND not-geo."""
    return jnp.minimum(sem_mask, 1.0 - geo_dynamic.astype(jnp.float32))


def correction_dynamic_mask(db: GeometryDB, cur_depth: jnp.ndarray,
                            T_cw: jnp.ndarray, cfg: SlamConfig) -> jnp.ndarray:
    """ExtractDynPoints + DepthRegionGrowing as one unit: the [H, W] bool
    dynamic mask of GeometricModelCorrection (Geometry.cc:29-40).

    At production resolutions (>=240 rows) the whole stage runs on the HALF
    grid — 5 dense per-reference reprojections + a 64-iteration flood fill
    were ~60% of the fused geometry frame at 480x640 — with the seed/grow
    thresholds unchanged (they are metric) and the grown mask upsampled at
    the end (consumers are keypoint culling + blob fusion, insensitive to
    1-px boundary quanta, exactly like the half-res Mahalanobis masker)."""
    import dataclasses
    cam = cfg.camera
    if cam.height < 240:
        seeds = extract_dynamic_seeds(db, cur_depth, T_cw, cfg)
        dil = max(int(round(cfg.geometry.dilation_px * cam.width / 640.0)), 2)
        return depth_region_growing(
            seeds, cur_depth, cfg.geometry.region_growing_threshold, 64, dil)
    Hf, Wf = cam.height, cam.width
    H2, W2 = (Hf + 1) // 2, (Wf + 1) // 2
    # Half grid: pixel (vh, uh) covers full-res (2vh, 2uh), so intrinsics
    # simply halve (see geomask.mahalanobis_mask for the derivation).
    cam_h = dataclasses.replace(cam, fx=cam.fx / 2, fy=cam.fy / 2,
                                cx=cam.cx / 2, cy=cam.cy / 2,
                                width=W2, height=H2)
    cfg_h = dataclasses.replace(cfg, camera=cam_h)
    # nearest-subsample depths: never average across discontinuities
    db_h = db._replace(gray=db.gray[:, ::2, ::2],
                       depth=db.depth[:, ::2, ::2],
                       mask=db.mask[:, ::2, ::2],
                       rgb=db.rgb[:, ::2, ::2])
    d_h = cur_depth[::2, ::2]
    seeds = extract_dynamic_seeds(db_h, d_h, T_cw, cfg_h)
    dil = max(int(round(cfg.geometry.dilation_px * cam.width / 640.0 / 2)), 2)
    grown = depth_region_growing(
        seeds, d_h, cfg.geometry.region_growing_threshold, 40, dil)
    return jnp.repeat(jnp.repeat(grown, 2, 0), 2, 1)[:Hf, :Wf]


@partial(jax.jit, static_argnums=(5,))
def inpaint(db: GeometryDB, cur_rgb, cur_depth, cur_mask, T_cw,
            cfg: SlamConfig):
    """FillRGBD (Geometry.cc:478-945): composite DB static pixels into the
    current view with min-depth occlusion; fill only where cur_mask==0 (and
    missing depth). Returns (rgb_out, depth_out).

    Two passes over the ring DB (one lax.scan each):
      1. z-buffer: per-target-pixel minimum projected depth across every DB
         frame (occlusion resolution).
      2. area-weighted accumulation: each source pixel lands at a
         non-integer target position and distributes its color/depth to the
         4 surrounding pixels with bilinear area weights — the reference's
         Area(x, x_a, y, y_a) accumulator images (Geometry.cc:587-601) —
         keeping only contributions within a depth-similarity band of the
         z-buffer winner. Nearest-pixel winner-takes-all (the round-1/2
         design) left aliasing seams and single-pixel holes the reference
         fills; the weighted accumulation reproduces its smooth composite.
    """
    cam = cfg.camera
    g = cfg.geometry
    H, W = cam.height, cam.width
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    uv = jnp.stack([u, v], -1)
    HW = H * W

    def project_frame(idx):
        """(u_f, v_f, z_proj, src_ok) of DB frame idx in the current view."""
        ok = db.valid[idx]
        z_ref = db.depth[idx]
        T_rel = T_cw @ lie.se3_inverse(db.pose[idx])
        X = lie.se3_apply(T_rel, cam_ops.backproject(uv, z_ref, cam))
        uv_c, z_proj = cam_ops.project(X, cam)
        u_f, v_f = uv_c[..., 0], uv_c[..., 1]
        src_ok = ok & (z_ref > g.min_depth_threshold) & \
            (db.mask[idx] > 0.5) & (z_proj > g.min_depth_threshold) & \
            (u_f >= 0) & (u_f < W - 1) & (v_f >= 0) & (v_f < H - 1)
        return u_f, v_f, z_proj, src_ok

    def corners(u_f, v_f):
        """4 bilinear corners: (ui, vi, weight) each [H, W]."""
        u0 = jnp.floor(u_f)
        v0 = jnp.floor(v_f)
        du = u_f - u0
        dv = v_f - v0
        u0 = u0.astype(jnp.int32)
        v0 = v0.astype(jnp.int32)
        return ((u0, v0, (1 - du) * (1 - dv)),
                (u0 + 1, v0, du * (1 - dv)),
                (u0, v0 + 1, (1 - du) * dv),
                (u0 + 1, v0 + 1, du * dv))

    # --- pass 1: bilinear-corner z-buffer --------------------------------
    def zbuf_frame(best_z, idx):
        u_f, v_f, z_proj, src_ok = project_frame(idx)
        for ui, vi, w in corners(u_f, v_f):
            touch = src_ok & (w > 1e-6)
            flat = jnp.where(touch, vi * W + ui, HW).reshape(-1)
            best_z = best_z.at[flat].min(
                jnp.where(touch, z_proj, jnp.inf).reshape(-1))
        return best_z, None

    best_z, _ = jax.lax.scan(zbuf_frame, jnp.full(HW + 1, jnp.inf),
                             jnp.arange(db.valid.shape[0]))
    best_z = best_z[:HW]

    # --- pass 2: accumulate (w, w*rgb, w*z) within the depth band --------
    def acc_frame(carry, idx):
        acc_w, acc_rgb, acc_z = carry
        u_f, v_f, z_proj, src_ok = project_frame(idx)
        rgb_src = db.rgb[idx]
        for ui, vi, w in corners(u_f, v_f):
            flat_c = jnp.clip(vi * W + ui, 0, HW - 1)
            # depth-similarity band around the z-buffer winner: occluded
            # contributions (behind a nearer surface) are rejected the way
            # the reference's depth checks reject them
            near = z_proj <= best_z[flat_c] + jnp.maximum(
                0.04 * z_proj, 0.05)
            keep = src_ok & near & (w > 1e-6)
            flat = jnp.where(keep, vi * W + ui, HW).reshape(-1)
            wk = jnp.where(keep, w, 0.0).reshape(-1)
            acc_w = acc_w.at[flat].add(wk)
            acc_rgb = acc_rgb.at[flat].add(wk[:, None] *
                                           rgb_src.reshape(-1, 3))
            acc_z = acc_z.at[flat].add(wk * z_proj.reshape(-1))
        return (acc_w, acc_rgb, acc_z), None

    (acc_w, acc_rgb, acc_z), _ = jax.lax.scan(
        acc_frame,
        (jnp.zeros(HW + 1), jnp.zeros((HW + 1, 3)), jnp.zeros(HW + 1)),
        jnp.arange(db.valid.shape[0]))
    wsum = jnp.maximum(acc_w[:HW], 1e-9).reshape(H, W)
    mean_rgb = acc_rgb[:HW].reshape(H, W, 3) / wsum[..., None]
    mean_z = acc_z[:HW].reshape(H, W) / wsum

    have = (acc_w[:HW].reshape(H, W) > 1e-6) & \
        jnp.isfinite(best_z.reshape(H, W))
    hole = (cur_mask < 0.5) | (cur_depth <= 0)
    rgb_out = jnp.where((hole & have)[..., None], mean_rgb, cur_rgb)
    depth_out = jnp.where(hole & have, mean_z, cur_depth)
    return rgb_out, depth_out


class Geometry:
    """Host wrapper mirroring the reference Geometry object lifecycle."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        cam = cfg.camera
        self.db = new_db(cfg.geometry.max_db_size, cam.height, cam.width)

    def geometric_model_correction(self, cur_depth, T_cw, sem_mask):
        """GeometricModelCorrection (Geometry.cc:29-40): returns the refined
        static mask for the current frame."""
        if not bool(jnp.any(self.db.valid)):
            return sem_mask
        grown = correction_dynamic_mask(self.db, cur_depth, T_cw, self.cfg)
        return combine_masks(sem_mask, grown)

    def inpaint_frames(self, cur_rgb, cur_depth, cur_mask, T_cw):
        return inpaint(self.db, cur_rgb, cur_depth, cur_mask, T_cw, self.cfg)

    def update_db(self, gray, depth, mask, rgb, T_cw, is_keyframe: bool):
        if is_keyframe:
            self.db = db_insert(self.db, gray, depth, mask, rgb, T_cw)

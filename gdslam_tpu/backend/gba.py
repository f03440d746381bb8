"""Global bundle adjustment + keyframe culling.

- `global_bundle_adjustment` replaces Optimizer::GlobalBundleAdjustemnt [sic]
  / LoopClosing::RunGlobalBundleAdjustment (reference Optimizer.cc:41-237,
  LoopClosing.cc:645-750): refine ALL keyframe poses and map points after a
  loop closure. At arena scale (512 KFs x 64k points) a full dense Schur
  coupling tensor would not fit, so GBA runs as block-coordinate descent
  ("resection-intersection"): vmapped per-keyframe pose GN with points
  fixed, then closed-form per-point GN with poses fixed, alternated. Each
  half-step is one XLA program; convergence per sweep is slower than joint
  Schur but memory is O(edges).
- `keyframe_culling` replaces LocalMapping::KeyFrameCulling
  (LocalMapping.cc:632-): discard keyframes whose observations are >= 90%
  redundant (each point seen by >= 3 other keyframes at finer-or-equal
  scale — the scale test is dropped here; observation count >= 4 total).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gdslam_tpu.backend import map_arena as ma
from gdslam_tpu.backend.ba import _inv3x3
from gdslam_tpu.backend.optimizer import CHI2_MONO, CHI2_STEREO
from gdslam_tpu.config import SlamConfig
from gdslam_tpu.core import lie

_PREC = jax.lax.Precision.HIGHEST


def _all_edge_terms(arena: ma.MapArena, poses, pts, K, bf, sf,
                    inlier=None):
    """Residuals/weights for every (keyframe, keypoint) observation."""
    fx, fy, cx, cy = K
    obs = arena.kf_obs                                  # [A, N]
    slot = jnp.maximum(obs, 0)
    Xw = pts[slot]
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    Xc = jnp.einsum("aij,anj->ani", R, Xw, precision=_PREC) + t[:, None]
    z = Xc[..., 2]
    z_ok = z > 1e-6
    iz = 1.0 / jnp.where(z_ok, z, 1.0)
    u_hat = fx * Xc[..., 0] * iz + cx
    v_hat = fy * Xc[..., 1] * iz + cy
    ur_hat = u_hat - bf * iz
    uv = arena.kf_uv
    ur = arena.kf_ur
    is_stereo = ur >= 0
    r = jnp.stack([u_hat - uv[..., 0], v_hat - uv[..., 1],
                   jnp.where(is_stereo, ur_hat - ur, 0.0)], axis=-1)
    inv_sigma2 = 1.0 / sf ** (2.0 * arena.kf_level.astype(jnp.float32))
    valid = (obs >= 0) & z_ok & arena.kf_valid[:, None]
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    e2 = jnp.sum(r * r, -1) * inv_sigma2
    w_huber = jnp.where(e2 <= chi2_th, 1.0,
                        jnp.sqrt(chi2_th / jnp.maximum(e2, 1e-12)))
    if inlier is not None:
        valid = valid & inlier
    w = jnp.where(valid, w_huber * inv_sigma2, 0.0)
    return Xc, r, w, iz, is_stereo, slot, e2, chi2_th, valid


@partial(jax.jit, static_argnums=(1, 2, 3))
def global_bundle_adjustment(arena: ma.MapArena, cfg: SlamConfig,
                             sweeps: int = 4,
                             gate_outliers: bool = False) -> ma.MapArena:
    """Alternating pose/point refinement over the whole map.

    gate_outliers: chi2-gate the edge set against the INITIAL state before
    optimizing. Use when the initialization is trustworthy (post-loop, after
    the essential-graph correction): drift-inconsistent seam observations
    are then outliers to be excluded, not constraints (the reference cleans
    them via SearchAndFuse before its loop GBA, LoopClosing.cc:525-560).
    Leave False for generic refinement — on a globally-perturbed map every
    residual is large and gating would discard the constraints recovery
    needs."""
    cam = cfg.camera
    K = (cam.fx, cam.fy, cam.cx, cam.cy)
    fx, fy = cam.fx, cam.fy
    bf = cam.bf
    sf = float(cfg.orb.scale_factor)

    def sweep(_, state):
        poses, pts, inlier = state
        # ---- pose half-step: per-keyframe GN, points fixed ----
        Xc, r, w, iz, is_stereo, slot, e2, chi2_th, _ = _all_edge_terms(
            arena, poses, pts, K, bf, sf, inlier)
        iz2 = iz * iz
        zero = jnp.zeros_like(iz)
        du = jnp.stack([fx * iz, zero, -fx * Xc[..., 0] * iz2], -1)
        dv = jnp.stack([zero, fy * iz, -fy * Xc[..., 1] * iz2], -1)
        dur = jnp.stack([fx * iz, zero, -fx * Xc[..., 0] * iz2 + bf * iz2], -1)
        dproj = jnp.stack([du, dv, jnp.where(is_stereo[..., None], dur, 0.0)],
                          -2)
        dXc = jnp.concatenate([
            jnp.broadcast_to(jnp.eye(3), Xc.shape + (3,)), -lie.hat(Xc)], -1)
        Jc = jnp.einsum("anri,anik->anrk", dproj, dXc, precision=_PREC)
        H = jnp.einsum("anri,an,anrj->aij", Jc, w, Jc, precision=_PREC)
        b = jnp.einsum("anri,an,anr->ai", Jc, w, r, precision=_PREC)
        H = H + 1e-4 * jnp.eye(6)
        dx = -jax.vmap(lambda Hm, bv: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hm), bv))(H, b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        # keyframe 0 stays fixed (gauge)
        dx = dx.at[0].set(0.0)
        dx = dx * arena.kf_valid[:, None]
        poses = jax.vmap(lambda x, T: lie.se3_exp(x) @ T)(dx, poses)

        # ---- point half-step: closed-form 3x3 GN, poses fixed ----
        Xc, r, w, iz, is_stereo, slot, e2, chi2_th, _ = _all_edge_terms(
            arena, poses, pts, K, bf, sf, inlier)
        iz2 = iz * iz
        du = jnp.stack([fx * iz, zero, -fx * Xc[..., 0] * iz2], -1)
        dv = jnp.stack([zero, fy * iz, -fy * Xc[..., 1] * iz2], -1)
        dur = jnp.stack([fx * iz, zero, -fx * Xc[..., 0] * iz2 + bf * iz2], -1)
        dproj = jnp.stack([du, dv, jnp.where(is_stereo[..., None], dur, 0.0)],
                          -2)
        Jp = jnp.einsum("anri,aik->anrk", dproj, poses[:, :3, :3],
                        precision=_PREC)
        Hpp = jnp.zeros((arena.pmax, 3, 3)).at[slot.reshape(-1)].add(
            jnp.einsum("anri,an,anrj->anij", Jp, w, Jp,
                       precision=_PREC).reshape(-1, 3, 3))
        bp = jnp.zeros((arena.pmax, 3)).at[slot.reshape(-1)].add(
            jnp.einsum("anri,an,anr->ani", Jp, w, r,
                       precision=_PREC).reshape(-1, 3))
        Hpp = Hpp + 1e-4 * jnp.eye(3)
        dp = -jnp.einsum("pij,pj->pi", _inv3x3(Hpp), bp, precision=_PREC)
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0) * arena.pt_valid[:, None]
        pts = pts + dp
        return poses, pts, inlier

    def gated_inlier(poses, pts, chi2_factor):
        _, _, _, _, _, _, e2, chi2_th, valid = _all_edge_terms(
            arena, poses, pts, K, bf, sf)
        return valid & (e2 <= chi2_factor * chi2_th)

    if gate_outliers:
        inlier = gated_inlier(arena.kf_pose, arena.pt_pos, 4.0)
        h1 = max(sweeps // 2, 1)
        poses, pts, _ = jax.lax.fori_loop(
            0, h1, sweep, (arena.kf_pose, arena.pt_pos, inlier))
        inlier = gated_inlier(poses, pts, 1.0)
        poses, pts, _ = jax.lax.fori_loop(h1, sweeps, sweep,
                                          (poses, pts, inlier))
    else:
        all_in = jnp.ones(arena.kf_obs.shape, bool)
        poses, pts, _ = jax.lax.fori_loop(
            0, sweeps, sweep, (arena.kf_pose, arena.pt_pos, all_in))
    # Re-project onto SE(3) — exp-compositions accumulate SO(3) deviation
    # that downstream transpose-inverses amplify (lie.so3_project).
    return arena._replace(kf_pose=lie.se3_orthonormalize(poses), pt_pos=pts)


@jax.jit
def keyframe_culling(arena: ma.MapArena, protect_last: int = 2) -> ma.MapArena:
    """Discard keyframes with >=90% redundant observations
    (LocalMapping::KeyFrameCulling semantics). The last `protect_last`
    keyframes and keyframe 0 are never culled."""
    obs = arena.kf_obs
    has = obs >= 0
    n_obs_pt = arena.pt_n_obs[jnp.maximum(obs, 0)]
    redundant = has & (n_obs_pt >= 4)
    n_has = jnp.maximum(jnp.sum(has, axis=1), 1)
    frac = jnp.sum(redundant, axis=1) / n_has
    ids = jnp.arange(arena.kmax)
    cullable = arena.kf_valid & (frac > 0.9) & (ids != 0) & \
        (ids < arena.n_kf - protect_last)
    # decrement observation counts of culled keyframes' points
    dec = jnp.zeros(arena.pmax, jnp.int32).at[
        jnp.where(cullable[:, None] & has, obs, 0).reshape(-1)].add(
        (cullable[:, None] & has).reshape(-1).astype(jnp.int32))
    return arena._replace(
        kf_valid=arena.kf_valid & ~cullable,
        kf_obs=jnp.where(cullable[:, None], -1, arena.kf_obs),
        pt_n_obs=jnp.maximum(arena.pt_n_obs - dec, 0),
    )

"""Global bundle adjustment + keyframe culling.

- `global_bundle_adjustment` replaces Optimizer::GlobalBundleAdjustemnt [sic]
  / LoopClosing::RunGlobalBundleAdjustment (reference Optimizer.cc:41-237,
  LoopClosing.cc:645-750): refine ALL keyframe poses and map points after a
  loop closure. The reference runs joint Levenberg-Marquardt through g2o's
  sparse Schur solver; at arena scale (512 KFs x 64k points) a dense Schur
  coupling tensor would not fit, so the joint normal equations are solved
  MATRIX-FREE: each Gauss-Newton step runs preconditioned conjugate gradient
  where the Hessian-vector product is two einsum passes over the dense
  [K, N] observation table (J v then J^T w J v) — the standard large-scale
  BA formulation (inexact Newton / CG on the reduced system, "Bundle
  Adjustment in the Large"), and ideal XLA work: every CG iteration is a
  fixed-shape fused program. Steps are accepted under LM control (adaptive
  damping, reject on robust-cost increase) so a bad linearization can never
  destroy the map.
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
from gdslam_tpu.backend.optimizer import CHI2_MONO, CHI2_STEREO
from gdslam_tpu.config import SlamConfig
from gdslam_tpu.core import lie

_PREC = jax.lax.Precision.HIGHEST

CG_ITERS = 20


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
    valid = (obs >= 0) & z_ok & arena.kf_valid[:, None] & \
        arena.pt_valid[slot]
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    e2 = jnp.sum(r * r, -1) * inv_sigma2
    w_huber = jnp.where(e2 <= chi2_th, 1.0,
                        jnp.sqrt(chi2_th / jnp.maximum(e2, 1e-12)))
    if inlier is not None:
        valid = valid & inlier
    w = jnp.where(valid, w_huber * inv_sigma2, 0.0)
    return Xc, r, w, iz, is_stereo, slot, e2, chi2_th, valid


def _robust_cost(arena, poses, pts, K, bf, sf, inlier):
    """Total Huber-robustified chi2 (the LM acceptance criterion).

    The edge set is FROZEN to the state-independent mask (observation
    structure + the caller's inlier gate): an edge whose point falls behind
    the camera (z <= 1e-6) at the evaluated state pays a saturated Huber
    penalty instead of dropping out — otherwise a candidate step that
    pushes points behind the camera would shrink its own cost sum and be
    accepted while degrading the map (the exact divergence mode LM
    acceptance exists to prevent)."""
    _, _, _, _, _, _, e2, chi2_th, valid = _all_edge_terms(
        arena, poses, pts, K, bf, sf, inlier)
    obs = arena.kf_obs
    structural = (obs >= 0) & arena.kf_valid[:, None] & \
        arena.pt_valid[jnp.maximum(obs, 0)]
    if inlier is not None:
        structural = structural & inlier
    # within structural edges, `valid` differs only by the state-dependent
    # z_ok gate — so ~valid there means "lost depth validity"
    rho = jnp.where(e2 <= chi2_th, e2,
                    2.0 * jnp.sqrt(chi2_th * jnp.maximum(e2, 0.0)) - chi2_th)
    # saturated penalty: the Huber rho of an e2 = 1e8 residual
    rho_sat = 2.0 * jnp.sqrt(chi2_th * 1e8) - chi2_th
    return jnp.sum(jnp.where(structural, jnp.where(valid, rho, rho_sat), 0.0))


@partial(jax.jit, static_argnums=(1, 2, 3))
def global_bundle_adjustment(arena: ma.MapArena, cfg: SlamConfig,
                             sweeps: int = 4,
                             gate_outliers: bool = False) -> ma.MapArena:
    """Joint pose+point Gauss-Newton, each step solved matrix-free with
    Jacobi-preconditioned CG, accepted under Levenberg-Marquardt control.

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
    A = arena.kmax
    P = arena.pmax
    free_c = arena.kf_valid & (jnp.arange(A) != 0)   # kf 0 = gauge anchor
    free_p = arena.pt_valid

    def gn_step(carry):
        poses, pts, lam, cost, inlier = carry
        Xc, r, w, iz, is_stereo, slot, _, _, _ = _all_edge_terms(
            arena, poses, pts, K, bf, sf, inlier)
        iz2 = iz * iz
        zero = jnp.zeros_like(iz)
        du = jnp.stack([fx * iz, zero, -fx * Xc[..., 0] * iz2], -1)
        dv = jnp.stack([zero, fy * iz, -fy * Xc[..., 1] * iz2], -1)
        dur = jnp.stack([fx * iz, zero,
                         -fx * Xc[..., 0] * iz2 + bf * iz2], -1)
        dproj = jnp.stack([du, dv,
                           jnp.where(is_stereo[..., None], dur, 0.0)], -2)
        dXc = jnp.concatenate([
            jnp.broadcast_to(jnp.eye(3), Xc.shape + (3,)), -lie.hat(Xc)], -1)
        Jc = jnp.einsum("anri,anik->anrk", dproj, dXc,
                        precision=_PREC)                         # [A,N,3,6]
        Jp = jnp.einsum("anri,aik->anrk", dproj, poses[:, :3, :3],
                        precision=_PREC)                         # [A,N,3,3]
        flat_slot = slot.reshape(-1)

        # Gradient g = J^T W r and Jacobi diagonal of H = J^T W J.
        gc = jnp.einsum("anri,an,anr->ai", Jc, w, r, precision=_PREC)
        gp = jnp.zeros((P, 3)).at[flat_slot].add(
            jnp.einsum("anri,an,anr->ani", Jp, w, r,
                       precision=_PREC).reshape(-1, 3))
        dc = jnp.einsum("anri,an,anri->ai", Jc, w, Jc, precision=_PREC)
        dp = jnp.zeros((P, 3)).at[flat_slot].add(
            jnp.einsum("anri,an,anri->ani", Jp, w, Jp,
                       precision=_PREC).reshape(-1, 3))
        gc = jnp.where(free_c[:, None], gc, 0.0)
        gp = jnp.where(free_p[:, None], gp, 0.0)
        # LM-damped diagonal (also the Jacobi preconditioner).
        dcd = dc * (1.0 + lam) + 1e-6
        dpd = dp * (1.0 + lam) + 1e-6
        Mc = jnp.where(free_c[:, None], 1.0 / dcd, 0.0)
        Mp = jnp.where(free_p[:, None], 1.0 / dpd, 0.0)

        def matvec(vc, vp):
            vc = jnp.where(free_c[:, None], vc, 0.0)
            vp = jnp.where(free_p[:, None], vp, 0.0)
            u = jnp.einsum("anri,ai->anr", Jc, vc, precision=_PREC) + \
                jnp.einsum("anrk,ank->anr", Jp, vp[slot], precision=_PREC)
            u = u * w[..., None]
            oc = jnp.einsum("anri,anr->ai", Jc, u, precision=_PREC)
            op = jnp.zeros((P, 3)).at[flat_slot].add(
                jnp.einsum("anrk,anr->ank", Jp, u,
                           precision=_PREC).reshape(-1, 3))
            oc = jnp.where(free_c[:, None], oc, 0.0) + lam * dc * vc
            op = jnp.where(free_p[:, None], op, 0.0) + lam * dp * vp
            return oc, op

        # PCG on H dx = -g.
        bc, bp = -gc, -gp
        x_c = jnp.zeros_like(bc)
        x_p = jnp.zeros_like(bp)
        z_c, z_p = Mc * bc, Mp * bp
        rz0 = jnp.sum(bc * z_c) + jnp.sum(bp * z_p)

        def cg_iter(_, s):
            x_c, x_p, r_c, r_p, p_c, p_p, rz = s
            Ap_c, Ap_p = matvec(p_c, p_p)
            pAp = jnp.sum(p_c * Ap_c) + jnp.sum(p_p * Ap_p)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
            alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
            x_c = x_c + alpha * p_c
            x_p = x_p + alpha * p_p
            r_c = r_c - alpha * Ap_c
            r_p = r_p - alpha * Ap_p
            z_c, z_p = Mc * r_c, Mp * r_p
            rz_new = jnp.sum(r_c * z_c) + jnp.sum(r_p * z_p)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            beta = jnp.where(jnp.isfinite(beta), beta, 0.0)
            p_c = z_c + beta * p_c
            p_p = z_p + beta * p_p
            return x_c, x_p, r_c, r_p, p_c, p_p, rz_new

        x_c, x_p, *_ = jax.lax.fori_loop(
            0, CG_ITERS, cg_iter, (x_c, x_p, bc, bp, z_c, z_p, rz0))
        x_c = jnp.where(jnp.isfinite(x_c) & free_c[:, None], x_c, 0.0)
        x_p = jnp.where(jnp.isfinite(x_p) & free_p[:, None], x_p, 0.0)

        # LM acceptance: keep the step only if the robust cost decreases.
        cand_poses = lie.se3_orthonormalize(
            jax.vmap(lambda x, T: lie.se3_exp(x) @ T)(x_c, poses))
        cand_pts = pts + x_p
        cand_cost = _robust_cost(arena, cand_poses, cand_pts, K, bf, sf,
                                 inlier)
        accept = cand_cost < cost
        poses = jnp.where(accept, cand_poses, poses)
        pts = jnp.where(accept, cand_pts, pts)
        cost = jnp.where(accept, cand_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.33, lam * 8.0), 1e-6, 1e3)
        return poses, pts, lam, cost, inlier

    def run(poses, pts, inlier, n):
        cost0 = _robust_cost(arena, poses, pts, K, bf, sf, inlier)
        carry = (poses, pts, jnp.asarray(1e-4, jnp.float32), cost0, inlier)
        carry = jax.lax.fori_loop(0, n, lambda _, c: gn_step(c), carry)
        return carry[0], carry[1]

    def gated_inlier(poses, pts, chi2_factor):
        _, _, _, _, _, _, e2, chi2_th, valid = _all_edge_terms(
            arena, poses, pts, K, bf, sf)
        return valid & (e2 <= chi2_factor * chi2_th)

    if gate_outliers:
        inlier = gated_inlier(arena.kf_pose, arena.pt_pos, 4.0)
        h1 = max(sweeps // 2, 1)
        poses, pts = run(arena.kf_pose, arena.pt_pos, inlier, h1)
        # sweeps - h1 may be 0 (sweeps=1): the re-gate still applies but no
        # further LM step runs, keeping the total at the requested count
        inlier = gated_inlier(poses, pts, 1.0)
        poses, pts = run(poses, pts, inlier, sweeps - h1)
    else:
        all_in = jnp.ones(arena.kf_obs.shape, bool)
        poses, pts = run(arena.kf_pose, arena.pt_pos, all_in, sweeps)
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

"""Pose-graph (essential graph) optimization after loop closure.

Replaces Optimizer::OptimizeEssentialGraph (reference Optimizer.cc:997-1260):
vertices = all keyframe poses, edges = spanning tree + loop edges +
strong-covisibility edges (weight >= 100, minFeat Optimizer.cc:1022),
measurements = relative poses at graph-build time (loop edges carry the
Sim3/SE3 computed by the loop solver), 20 iterations.

For RGB-D the scale is fixed (Sim3Solver.h:20 bFixScale), so the graph is
optimized over SE3. TPU design: per-edge 6x6 Jacobian blocks come from
`jax.jacfwd` of the closed-form residual (exact, no hand-derived adjoints),
assembled into a dense [6K, 6K] normal matrix with scatter-adds and solved
with Cholesky — at K<=512 this is a 3072^2 dense solve, ideal MXU work.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gdslam_tpu.core import lie

_PREC = jax.lax.Precision.HIGHEST


class PoseGraphEdges(NamedTuple):
    i: jnp.ndarray        # [E] int32 vertex ids
    j: jnp.ndarray        # [E]
    T_meas: jnp.ndarray   # [E, 4, 4] measured T_i @ inv(T_j)
    weight: jnp.ndarray   # [E] float
    valid: jnp.ndarray    # [E] bool


def build_edges(kf_pose: jnp.ndarray, kf_valid: jnp.ndarray,
                kf_parent: jnp.ndarray, covis: jnp.ndarray,
                loop_i: jnp.ndarray, loop_j: jnp.ndarray,
                loop_T: jnp.ndarray, loop_valid: jnp.ndarray,
                covis_min: int = 100, max_covis_edges: int = 2048
                ) -> PoseGraphEdges:
    """Collect spanning-tree + covisibility(>=100) + loop edges."""
    K = kf_pose.shape[0]
    ids = jnp.arange(K)

    def rel(i, j):
        return kf_pose[i] @ lie.se3_inverse(kf_pose[j])

    # Spanning tree edges (child -> parent).
    tree_j = jnp.maximum(kf_parent, 0)
    tree_valid = kf_valid & (kf_parent >= 0)
    tree_T = jax.vmap(rel)(ids, tree_j)

    # Strong covisibility edges (upper triangle only).
    w = jnp.where(jnp.triu(jnp.ones_like(covis), 1) > 0, covis, 0)
    w = jnp.where(kf_valid[:, None] & kf_valid[None, :], w, 0)
    flat = w.reshape(-1)
    top_w, top_idx = jax.lax.top_k(flat, max_covis_edges)
    ci = top_idx // K
    cj = top_idx % K
    cvalid = top_w >= covis_min
    cT = jax.vmap(rel)(ci, cj)

    return PoseGraphEdges(
        i=jnp.concatenate([ids, ci, loop_i]),
        j=jnp.concatenate([tree_j, cj, loop_j]),
        T_meas=jnp.concatenate([tree_T, cT, loop_T], axis=0),
        weight=jnp.concatenate([
            jnp.ones(K), jnp.ones(max_covis_edges),
            jnp.full(loop_i.shape[0], 5.0)]),
        valid=jnp.concatenate([tree_valid, cvalid, loop_valid]),
    )


def _edge_residual(xi_i, xi_j, T_i0, T_j0, T_meas):
    T_i = lie.se3_exp(xi_i) @ T_i0
    T_j = lie.se3_exp(xi_j) @ T_j0
    return lie.se3_log(lie.se3_inverse(T_meas) @ (T_i @ lie.se3_inverse(T_j)))


@partial(jax.jit, static_argnums=(3,))
def optimize(kf_pose: jnp.ndarray, kf_valid: jnp.ndarray,
             edges: PoseGraphEdges, iters: int = 20,
             fixed_id: int = 0, damping: float = 1e-6) -> jnp.ndarray:
    """Run GN on the pose graph; returns updated [K, 4, 4] poses."""
    K = kf_pose.shape[0]

    res_fn = jax.vmap(_edge_residual)
    Ji_fn = jax.vmap(jax.jacfwd(_edge_residual, argnums=0))
    Jj_fn = jax.vmap(jax.jacfwd(_edge_residual, argnums=1))
    zero6 = jnp.zeros((edges.i.shape[0], 6))

    def gn_iter(_, poses):
        Ti0 = poses[edges.i]
        Tj0 = poses[edges.j]
        r = res_fn(zero6, zero6, Ti0, Tj0, edges.T_meas)       # [E, 6]
        Ji = Ji_fn(zero6, zero6, Ti0, Tj0, edges.T_meas)       # [E, 6, 6]
        Jj = Jj_fn(zero6, zero6, Ti0, Tj0, edges.T_meas)
        w = edges.weight * edges.valid
        H = jnp.zeros((K, 6, K, 6))
        b = jnp.zeros((K, 6))

        def blk(Ja, Jb):
            return jnp.einsum("eri,e,erj->eij", Ja, w, Jb, precision=_PREC)

        H = H.at[edges.i, :, edges.i, :].add(blk(Ji, Ji))
        H = H.at[edges.j, :, edges.j, :].add(blk(Jj, Jj))
        H = H.at[edges.i, :, edges.j, :].add(blk(Ji, Jj))
        H = H.at[edges.j, :, edges.i, :].add(blk(Jj, Ji))
        b = b.at[edges.i].add(jnp.einsum("eri,e,er->ei", Ji, w, r,
                                         precision=_PREC))
        b = b.at[edges.j].add(jnp.einsum("eri,e,er->ei", Jj, w, r,
                                         precision=_PREC))
        # Fix gauge + padded vertices: identity rows.
        free = kf_valid & (jnp.arange(K) != fixed_id)
        Hm = H.reshape(6 * K, 6 * K)
        mask = jnp.repeat(free, 6)
        Hm = jnp.where(mask[:, None] & mask[None, :], Hm, 0.0)
        Hm = Hm + jnp.diag(jnp.where(mask, damping, 1.0))
        bv = jnp.where(mask, b.reshape(-1), 0.0)
        dx = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hm), bv)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0).reshape(K, 6)
        return jax.vmap(lambda x, T: lie.se3_exp(x) @ T)(dx, poses)

    out = jax.lax.fori_loop(0, iters, gn_iter, kf_pose)
    return lie.se3_orthonormalize(out)

"""Fixed-capacity device-resident map arenas.

The reference's Map/KeyFrame/MapPoint pointer graph (Map.h, KeyFrame.h,
MapPoint.h) becomes flat preallocated arrays with validity masks — the
XLA-native representation: keyframe insertion, point creation, covisibility
updates, and culling are all masked array updates inside jit, with no
dynamic allocation. Capacities default to Kmax=512 keyframes / Pmax=65536
points (comfortably above TUM-sequence usage; see SURVEY §7.3).

Slots grow monotonically (cursor + cumsum allocation); culling clears valid
bits without recycling — simpler than a free list and capacity is cheap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapArena(NamedTuple):
    # --- keyframes ---
    kf_pose: jnp.ndarray      # [K, 4, 4] T_cw
    kf_valid: jnp.ndarray     # [K] bool
    kf_time: jnp.ndarray      # [K] float64-ish timestamp (float32 ok for tests)
    kf_uv: jnp.ndarray        # [K, N, 2] undistorted keypoint pixels
    kf_ur: jnp.ndarray        # [K, N] right-view u (<0: mono)
    kf_depth: jnp.ndarray     # [K, N] keypoint depth (0 invalid)
    kf_level: jnp.ndarray     # [K, N] int32 octave
    kf_angle: jnp.ndarray     # [K, N] float32
    kf_desc: jnp.ndarray      # [K, N, 32] uint8
    kf_kp_valid: jnp.ndarray  # [K, N] bool
    kf_obs: jnp.ndarray       # [K, N] int32 map-point id per keypoint (-1 none)
    # --- map points ---
    pt_pos: jnp.ndarray       # [P, 3] world position
    pt_valid: jnp.ndarray     # [P] bool
    pt_desc: jnp.ndarray      # [P, 32] uint8 distinctive descriptor
    pt_normal: jnp.ndarray    # [P, 3] mean viewing direction
    pt_min_dist: jnp.ndarray  # [P] scale-invariance range
    pt_max_dist: jnp.ndarray  # [P]
    pt_ref_kf: jnp.ndarray    # [P] int32 creating keyframe
    pt_n_obs: jnp.ndarray     # [P] int32 keyframe observation count
    pt_visible: jnp.ndarray   # [P] int32 frames where point was in frustum
    pt_found: jnp.ndarray     # [P] int32 frames where point was matched
    # --- graph ---
    covis: jnp.ndarray        # [K, K] int32 shared-observation weights
    kf_parent: jnp.ndarray    # [K] int32 spanning-tree parent (-1 root)
    # --- cursors (scalars as 0-d arrays) ---
    n_kf: jnp.ndarray
    n_pt: jnp.ndarray

    @property
    def kmax(self) -> int:
        return self.kf_pose.shape[0]

    @property
    def pmax(self) -> int:
        return self.pt_pos.shape[0]

    @property
    def n_features(self) -> int:
        return self.kf_uv.shape[1]


def new_arena(kmax: int = 512, pmax: int = 65536, n_features: int = 1500) -> MapArena:
    K, P, N = kmax, pmax, n_features
    return MapArena(
        kf_pose=jnp.tile(jnp.eye(4), (K, 1, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_time=jnp.zeros(K),
        kf_uv=jnp.zeros((K, N, 2)),
        kf_ur=-jnp.ones((K, N)),
        kf_depth=jnp.zeros((K, N)),
        kf_level=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N)),
        kf_desc=jnp.zeros((K, N, 32), jnp.uint8),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_obs=-jnp.ones((K, N), jnp.int32),
        pt_pos=jnp.zeros((P, 3)),
        pt_valid=jnp.zeros(P, bool),
        pt_desc=jnp.zeros((P, 32), jnp.uint8),
        pt_normal=jnp.zeros((P, 3)),
        pt_min_dist=jnp.zeros(P),
        pt_max_dist=jnp.zeros(P),
        pt_ref_kf=-jnp.ones(P, jnp.int32),
        pt_n_obs=jnp.zeros(P, jnp.int32),
        pt_visible=jnp.ones(P, jnp.int32),
        pt_found=jnp.ones(P, jnp.int32),
        covis=jnp.zeros((K, K), jnp.int32),
        kf_parent=-jnp.ones(K, jnp.int32),
        n_kf=jnp.asarray(0, jnp.int32),
        n_pt=jnp.asarray(0, jnp.int32),
    )


def update_covisibility(arena: MapArena, kf_id) -> MapArena:
    """Recompute covisibility weights of keyframe `kf_id` against all others.

    Weight = #shared map points (KeyFrame::UpdateConnections semantics,
    reference KeyFrame.cc:280; edges kept at weight >= 15 are selected by
    consumers). Dense one-hot matmul: obs [K, N] x obs[kf] -> shared counts.
    """
    obs_k = arena.kf_obs[kf_id]                       # [N]
    valid_k = obs_k >= 0
    # shared[j] = | {points observed by both kf_id and j} |
    # Compare via membership: for each keyframe j, count obs[j, n] in obs_k.
    # Build a point-indicator vector for kf_id: ind[p] = 1 if observed.
    ind = jnp.zeros(arena.pmax + 1, jnp.int32).at[
        jnp.where(valid_k, obs_k, arena.pmax)].set(1).at[arena.pmax].set(0)
    obs_all = jnp.where(arena.kf_obs >= 0, arena.kf_obs, arena.pmax)
    shared = jnp.sum(jnp.take(ind, obs_all, axis=0), axis=1)  # [K]
    shared = jnp.where(arena.kf_valid, shared, 0).astype(jnp.int32)
    shared = shared.at[kf_id].set(0)
    covis = arena.covis.at[kf_id, :].set(shared).at[:, kf_id].set(shared)
    # Spanning-tree parent: highest-covisibility earlier keyframe.
    parent = jnp.argmax(jnp.where(jnp.arange(arena.kmax) < kf_id, shared, -1))
    has_parent = (kf_id > 0) & (jnp.max(jnp.where(
        jnp.arange(arena.kmax) < kf_id, shared, -1)) > 0)
    kf_parent = arena.kf_parent.at[kf_id].set(
        jnp.where(has_parent, parent, -1).astype(jnp.int32))
    return arena._replace(covis=covis, kf_parent=kf_parent)


def local_keyframes(arena: MapArena, kf_id, cap: int = 80):
    """Top-`cap` covisible keyframes of kf_id (incl. itself). Returns
    ([cap] int32 ids, [cap] bool valid) — Tracking::UpdateLocalKeyFrames
    capped at 80 (Tracking.cc:1614)."""
    w = arena.covis[kf_id].at[kf_id].set(jnp.iinfo(jnp.int32).max)
    w = jnp.where(arena.kf_valid, w, -1)
    # tiny arenas (kmax < cap): pad so callers always see [cap] outputs
    if arena.kmax < cap:
        w = jnp.pad(w, (0, cap - arena.kmax), constant_values=-1)
    top_w, top_i = jax.lax.top_k(w, cap)
    return jnp.minimum(top_i, arena.kmax - 1), top_w > 0


@jax.jit
def compact_keyframes(arena: MapArena, perm: jnp.ndarray,
                      new_of_old: jnp.ndarray, n_keep) -> MapArena:
    """Recycle culled keyframe slots by compacting the keyframe arrays.

    The reference frees culled KeyFrame objects outright
    (KeyFrame::SetBadFlag, KeyFrame.cc:533-580); with fixed arenas the
    equivalent is a permutation gather that moves the surviving keyframes
    to the front, so the monotonic cursor regains headroom and long
    sequences never hit a silent mapping stop.

    perm: [K] int32 — perm[j] = old slot now stored at new slot j (the
        first n_keep entries are the surviving slots in ascending order,
        preserving recency == slot order).
    new_of_old: [K] int32 — new slot per old slot; culled slots map to the
        nearest SURVIVING predecessor (the stand-in for the reference's
        reparenting of a bad keyframe's children/points).
    n_keep: int32 scalar — number of surviving keyframes.
    """
    K = arena.kmax
    j = jnp.arange(K)
    live = j < n_keep

    def g(a):
        return a[perm]

    covis = arena.covis[perm][:, perm]
    covis = jnp.where(live[:, None] & live[None, :], covis, 0)
    parent_old = arena.kf_parent[perm]
    parent_new = jnp.where(parent_old >= 0,
                           new_of_old[jnp.maximum(parent_old, 0)], -1)
    # a keyframe whose remapped parent is itself (its parent was culled and
    # the nearest survivor IS the keyframe) becomes a root
    parent_new = jnp.where(parent_new == j, -1, parent_new)
    ref_new = new_of_old[jnp.clip(arena.pt_ref_kf, 0, K - 1)]
    return arena._replace(
        kf_pose=jnp.where(live[:, None, None], g(arena.kf_pose),
                          jnp.eye(4)),
        kf_valid=live & arena.kf_valid[perm],
        kf_time=jnp.where(live, g(arena.kf_time), 0.0),
        kf_uv=g(arena.kf_uv),
        kf_ur=g(arena.kf_ur),
        kf_depth=g(arena.kf_depth),
        kf_level=g(arena.kf_level),
        kf_angle=g(arena.kf_angle),
        kf_desc=g(arena.kf_desc),
        kf_kp_valid=jnp.where(live[:, None], g(arena.kf_kp_valid), False),
        kf_obs=jnp.where(live[:, None], g(arena.kf_obs), -1),
        covis=covis,
        kf_parent=jnp.where(live, parent_new, -1).astype(jnp.int32),
        pt_ref_kf=jnp.where(arena.pt_ref_kf >= 0, ref_new,
                            arena.pt_ref_kf).astype(jnp.int32),
        n_kf=jnp.asarray(n_keep, jnp.int32),
    )

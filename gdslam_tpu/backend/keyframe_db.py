"""Keyframe database for place recognition (loop detection + relocalization).

Replaces KeyFrameDatabase's DBoW2 inverted file (reference
KeyFrameDatabase.cc:76-198 DetectLoopCandidates, 199-311
DetectRelocalizationCandidates). With dense [K, n_leaves] BoW storage, the
shared-word accumulation + scoring of the inverted file collapses to one
matmul-like similarity against all keyframes, then the reference's gating
rules (covisibility min-score, 0.8x best-score acceptance, covisibility
exclusion window) are applied on the score vector.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gdslam_tpu.backend import map_arena as ma
from gdslam_tpu.backend import vocabulary as voc


class BowDatabase(NamedTuple):
    vectors: jnp.ndarray    # [K, n_leaves] L1-normalized BoW per keyframe
    words: jnp.ndarray      # [K, N] leaf word per keypoint (-1 invalid)
    valid: jnp.ndarray      # [K]


def new_db(kmax: int, n_features: int, n_leaves: int) -> BowDatabase:
    return BowDatabase(
        vectors=jnp.zeros((kmax, n_leaves)),
        words=-jnp.ones((kmax, n_features), jnp.int32),
        valid=jnp.zeros(kmax, bool),
    )


@jax.jit
def db_add(db: BowDatabase, kf_id, vec: jnp.ndarray, words: jnp.ndarray
           ) -> BowDatabase:
    return BowDatabase(
        vectors=db.vectors.at[kf_id].set(vec),
        words=db.words.at[kf_id].set(words),
        valid=db.valid.at[kf_id].set(True),
    )


@jax.jit
def query_scores(db: BowDatabase, vec: jnp.ndarray) -> jnp.ndarray:
    """L1 similarity of `vec` against every stored keyframe. [K]"""
    s = voc.l1_score(db.vectors, vec[None])
    return jnp.where(db.valid, s, -1.0)


def _group_accumulate(scores: jnp.ndarray, eligible: jnp.ndarray,
                      covis: jnp.ndarray, valid: jnp.ndarray,
                      n_neighbors: int = 10):
    """Covisibility-group score accumulation (KeyFrameDatabase.cc:120-198):
    each eligible keyframe i anchors a group = {i} + its top-`n_neighbors`
    covisible keyframes; accScore(i) = sum of direct scores of the group's
    ELIGIBLE members; the group's representative is its best-scoring member.
    This is what makes DBoW2 retrieval robust to single-frame aliasing — a
    wrong candidate rarely brings covisible friends that also score.

    Dense formulation: one top_k over the [K, K] covis matrix + gathers.
    Returns (acc [K], best_member [K] int32)."""
    K = scores.shape[0]
    es = jnp.where(eligible, scores, 0.0)
    w = jnp.where(valid[None, :], covis, 0)
    nb_w, nb_i = jax.lax.top_k(w, min(n_neighbors, K))    # [K, n]
    nb_live = nb_w > 0
    nb_scores = jnp.where(nb_live, es[nb_i], 0.0)
    acc = es + jnp.sum(nb_scores, axis=-1)
    member_scores = jnp.concatenate([es[:, None], nb_scores], axis=1)
    member_ids = jnp.concatenate(
        [jnp.arange(K, dtype=jnp.int32)[:, None], nb_i.astype(jnp.int32)],
        axis=1)
    best = jnp.argmax(member_scores, axis=-1)
    best_member = jnp.take_along_axis(member_ids, best[:, None], 1)[:, 0]
    return acc, best_member


@jax.jit
def loop_candidates(db: BowDatabase, arena: ma.MapArena, kf_id,
                    n_candidates: int = 8):
    """DetectLoopCandidates semantics (KeyFrameDatabase.cc:76-198):

    - minScore = lowest BoW similarity between kf_id and its covisible
      neighbors (LoopClosing.cc:120-139);
    - candidates must beat minScore and must NOT be covisibility-connected
      to kf_id (the inverted file excludes connected keyframes);
    - accumulated covisibility-GROUP scoring with the 0.75x bestAccScore
      retention rule (cc:152-198); returned ids are each retained group's
      best member.
    Returns (ids [n], acc_scores [n], min_score); ids may repeat when
    neighboring groups share a best member (callers iterate and dedup).
    """
    vec = db.vectors[kf_id]
    scores = query_scores(db, vec)
    # Connectivity exclusion uses the covisibility GRAPH (edges with weight
    # >= 15, KeyFrame::UpdateConnections th), NOT any shared observation:
    # a handful of residual matches across a drifted revisit must not veto
    # loop detection (arena.covis stores raw shared counts).
    connected = arena.covis[kf_id] >= 15
    neighbor_scores = jnp.where(
        connected & db.valid, scores, jnp.inf)
    min_score = jnp.minimum(jnp.min(neighbor_scores), 1.0)
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)
    eligible = db.valid & ~connected & \
        (jnp.arange(scores.shape[0]) != kf_id) & (scores >= min_score)
    acc, best_member = _group_accumulate(scores, eligible, arena.covis,
                                         db.valid)
    acc = jnp.where(eligible, acc, -1.0)
    retain = eligible & (acc >= 0.75 * jnp.max(acc))
    masked = jnp.where(retain, acc, -1.0)
    top_s, top_g = jax.lax.top_k(masked, n_candidates)
    return best_member[top_g], top_s, min_score


@jax.jit
def reloc_candidates(db: BowDatabase, arena: ma.MapArena, vec: jnp.ndarray,
                     n_candidates: int = 5):
    """DetectRelocalizationCandidates (KeyFrameDatabase.cc:199-311): the
    same covisibility-group accumulation as the loop query (no minScore /
    connectivity exclusion — the lost frame has no keyframe identity), with
    the 0.75x bestAccScore retention; returned per-group best members."""
    scores = query_scores(db, vec)
    eligible = db.valid & (scores > 0)
    acc, best_member = _group_accumulate(scores, eligible, arena.covis,
                                         db.valid)
    acc = jnp.where(eligible, acc, -1.0)
    retain = eligible & (acc >= 0.75 * jnp.max(acc))
    masked = jnp.where(retain, acc, -1.0)
    top_s, top_g = jax.lax.top_k(masked, n_candidates)
    return best_member[top_g], top_s, top_s > 0

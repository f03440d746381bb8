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


@jax.jit
def loop_candidates(db: BowDatabase, arena: ma.MapArena, kf_id,
                    n_candidates: int = 8):
    """DetectLoopCandidates semantics (KeyFrameDatabase.cc:76-198):

    - minScore = lowest BoW similarity between kf_id and its covisible
      neighbors (LoopClosing.cc:120-139);
    - candidates must beat minScore and must NOT be covisibility-connected
      to kf_id (the inverted file excludes connected keyframes);
    - return the top scorers (accumulated-group scoring approximated by the
      direct score; the 0.75x group rule is applied by the caller on these).
    Returns (ids [n], scores [n], min_score).
    """
    vec = db.vectors[kf_id]
    scores = query_scores(db, vec)
    connected = arena.covis[kf_id] > 0
    neighbor_scores = jnp.where(
        connected & db.valid, scores, jnp.inf)
    min_score = jnp.minimum(jnp.min(neighbor_scores), 1.0)
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)
    eligible = db.valid & ~connected & \
        (jnp.arange(scores.shape[0]) != kf_id) & (scores >= min_score)
    masked = jnp.where(eligible, scores, -1.0)
    top_s, top_i = jax.lax.top_k(masked, n_candidates)
    return top_i, top_s, min_score


@jax.jit
def reloc_candidates(db: BowDatabase, vec: jnp.ndarray, n_candidates: int = 5):
    """DetectRelocalizationCandidates (KeyFrameDatabase.cc:199-311): top
    scorers with the 0.8x best-score acceptance rule."""
    scores = query_scores(db, vec)
    top_s, top_i = jax.lax.top_k(scores, n_candidates)
    ok = top_s >= 0.8 * top_s[0]
    return top_i, top_s, ok

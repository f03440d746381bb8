"""Place-recognition retrieval precision at vocabulary scale.

The reference loads a ~1M-leaf DBoW2 vocabulary (TemplatedVocabulary.h:1338,
System.cc:50-58); the shipped default here must be large enough that
distinct places map to near-disjoint word sets. This test builds a BoW
database over N distinct viewpoints ("places") of the synthetic scene and
queries perturbed views of each: top-1 must be the same place.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.backend import vocabulary as voc
from gdslam_tpu.config import CameraConfig, OrbConfig
from gdslam_tpu.frontend import extractor
from gdslam_tpu.io import synthetic

CAM = CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=320,
                   height=240, bf=260.0 * 0.08)
ORB = OrbConfig(n_features=512, n_levels=4)
N_PLACES = 8
N_QUERIES = 2


def _views(rng):
    """(db_views, query_views): one anchor per place + N_QUERIES perturbed."""
    anchors, queries = [], []
    for p in range(N_PLACES):
        T = voc.random_pose(rng)
        anchors.append(jnp.asarray(T, jnp.float32))
        qs = []
        for _ in range(N_QUERIES):
            d = np.eye(4)
            yaw = rng.uniform(-0.04, 0.04)
            d[:3, :3] = np.asarray(
                [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                 [-np.sin(yaw), 0, np.cos(yaw)]])
            d[:3, 3] = rng.uniform(-0.05, 0.05, 3)
            qs.append(jnp.asarray(T @ d, jnp.float32))
        queries.append(qs)
    return anchors, queries


def _bow(v, gray):
    f = extractor.extract(gray, ORB, CAM.height, CAM.width)
    words = voc.transform(f.desc, v.centers, v.k, v.levels)
    words = jnp.where(f.valid, words, -1)
    return voc.bow_vector(words, words >= 0, v.n_leaves)


def _precision(v, anchors, queries):
    db = jnp.stack([_bow(v, synthetic.render(T, CAM, False).gray)
                    for T in anchors])
    hits = total = 0
    for p, qs in enumerate(queries):
        for T in qs:
            q = _bow(v, synthetic.render(T, CAM, False).gray)
            scores = voc.l1_score(db, q[None])
            hits += int(jnp.argmax(scores)) == p
            total += 1
    return hits / total


class TestVocabularyRetrieval:
    def test_default_vocab_scale(self):
        """The shipped default must be >= 10^4 leaves (VERDICT r4 #5; the
        reference's is ~10^6)."""
        v = voc.default_vocabulary()
        assert v.n_leaves >= 10_000

    @pytest.mark.e2e   # 24 renders + BoW transforms, ~1 min
    def test_retrieval_precision_default_vocab(self):
        """Top-1 retrieval over distinct places with perturbed queries."""
        rng = np.random.default_rng(3)
        anchors, queries = _views(rng)
        v = voc.default_vocabulary()
        prec = _precision(v, anchors, queries)
        assert prec >= 0.85, f"retrieval precision {prec:.2f} < 0.85"

    @pytest.mark.e2e   # minute-scale compile; full run covers it
    def test_tiny_vocab_aliases(self):
        """Sanity direction check: a much smaller vocabulary trained on the
        same data scores STRICTLY worse or equal — documents why the default
        is 10k leaves, guards against accidental vocab shrinkage."""
        rng = np.random.default_rng(3)
        anchors, queries = _views(rng)
        v_big = voc.default_vocabulary()
        prec_big = _precision(v_big, anchors, queries)
        # 100-leaf toy: train quickly on a handful of frames
        desc = []
        r2 = np.random.default_rng(11)
        for i in range(6):
            fr = synthetic.render(jnp.asarray(voc.random_pose(r2),
                                              jnp.float32), CAM, False)
            f = extractor.extract(fr.gray, ORB, CAM.height, CAM.width)
            desc.append(np.asarray(f.desc[np.asarray(f.valid)]))
        v_small = voc.train(np.concatenate(desc), k=10, levels=2)
        prec_small = _precision(v_small, anchors, queries)
        assert prec_big >= prec_small - 1e-9

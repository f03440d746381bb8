import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.backend import keyframe_db as kdb
from gdslam_tpu.backend import map_arena as ma
from gdslam_tpu.backend import pose_graph
from gdslam_tpu.backend import vocabulary as voc
from gdslam_tpu.core import lie
from gdslam_tpu.utils import metrics


@pytest.fixture(scope="module")
def vocab(rng):
    descs = rng.integers(0, 256, (3000, 32)).astype(np.uint8)
    return voc.train(descs, k=5, levels=2, iters=5)


class TestVocabulary:
    def test_transform_deterministic(self, vocab, rng):
        d = jnp.asarray(rng.integers(0, 256, (50, 32)), jnp.uint8)
        w1 = voc.transform(d, vocab.centers, vocab.k, vocab.levels)
        w2 = voc.transform(d, vocab.centers, vocab.k, vocab.levels)
        np.testing.assert_array_equal(w1, w2)
        assert int(w1.max()) < vocab.n_leaves

    def test_identical_sets_score_one(self, vocab, rng):
        d = jnp.asarray(rng.integers(0, 256, (100, 32)), jnp.uint8)
        w = voc.transform(d, vocab.centers, vocab.k, vocab.levels)
        v = voc.bow_vector(w, jnp.ones(100, bool), vocab.n_leaves)
        assert abs(float(voc.l1_score(v, v)) - 1.0) < 1e-6

    def test_similar_beats_random(self, vocab, rng):
        d1 = rng.integers(0, 256, (200, 32)).astype(np.uint8)
        # d2 = d1 with a few bit flips; d3 = fresh random
        d2 = d1.copy()
        d2[:, 0] ^= 1
        d3 = rng.integers(0, 256, (200, 32)).astype(np.uint8)
        vs = []
        for d in (d1, d2, d3):
            w = voc.transform(jnp.asarray(d), vocab.centers, vocab.k, vocab.levels)
            vs.append(voc.bow_vector(w, jnp.ones(200, bool), vocab.n_leaves))
        s_sim = float(voc.l1_score(vs[0], vs[1]))
        s_rand = float(voc.l1_score(vs[0], vs[2]))
        assert s_sim > s_rand

    def test_save_load_roundtrip(self, vocab, tmp_path):
        p = str(tmp_path / "v.npz")
        voc.save(vocab, p)
        v2 = voc.load(p)
        np.testing.assert_array_equal(np.asarray(v2.centers),
                                      np.asarray(vocab.centers))
        assert v2.k == vocab.k and v2.levels == vocab.levels


class TestKeyframeDB:
    def test_query_ranks_self_first(self, vocab, rng):
        db = kdb.new_db(8, 100, vocab.n_leaves)
        vecs = []
        for k in range(4):
            d = jnp.asarray(rng.integers(0, 256, (100, 32)), jnp.uint8)
            w = voc.transform(d, vocab.centers, vocab.k, vocab.levels)
            v = voc.bow_vector(w, jnp.ones(100, bool), vocab.n_leaves)
            vecs.append(v)
            db = kdb.db_add(db, jnp.asarray(k), v, w)
        s = kdb.query_scores(db, vecs[2])
        assert int(jnp.argmax(s)) == 2
        assert float(s[4]) == -1.0  # empty slot masked

    def test_reloc_candidates_accept_rule(self, vocab, rng):
        from gdslam_tpu.backend import map_arena as ma
        db = kdb.new_db(8, 100, vocab.n_leaves)
        arena = ma.new_arena(8, 64, 100)
        for k in range(3):
            d = jnp.asarray(rng.integers(0, 256, (100, 32)), jnp.uint8)
            w = voc.transform(d, vocab.centers, vocab.k, vocab.levels)
            v = voc.bow_vector(w, jnp.ones(100, bool), vocab.n_leaves)
            db = kdb.db_add(db, jnp.asarray(k), v, w)
        ids, scores, ok = kdb.reloc_candidates(db, arena, db.vectors[1])
        assert int(ids[0]) == 1
        assert bool(ok[0])

    def test_group_scoring_beats_direct_topk(self, vocab, rng):
        """Constructed DB where the reference's accumulated-group rule and
        direct top-1 disagree (VERDICT r2 item 6): keyframe 5 has the best
        DIRECT score but no covisible support; keyframes 1-3 are mutually
        covisible with slightly lower direct scores. The group rule must
        surface the supported family's best member, not the loner."""
        from gdslam_tpu.backend import map_arena as ma
        K = 8
        db = kdb.new_db(K, 100, vocab.n_leaves)
        arena = ma.new_arena(K, 64, 100)
        q = None
        for k in range(7):
            d = rng.integers(0, 256, (100, 32))
            w = voc.transform(jnp.asarray(d, jnp.uint8), vocab.centers,
                              vocab.k, vocab.levels)
            v = voc.bow_vector(w, jnp.ones(100, bool), vocab.n_leaves)
            db = kdb.db_add(db, jnp.asarray(k), v, w)
        # hand-craft scores by overwriting vectors: query vector q aligned
        # s.t. l1 similarity is controlled via shared mass
        nl = vocab.n_leaves
        base = np.zeros(nl); base[0] = 1.0
        q = jnp.asarray(base)

        def vec_with_sim(s):
            v = np.zeros(nl)
            v[0] = s          # shared mass s with the query
            v[1] = 1.0 - s
            return v

        vecs = np.zeros((K, nl))
        vecs[5] = vec_with_sim(0.9)     # loner: best direct score
        for k in (1, 2, 3):
            vecs[k] = vec_with_sim(0.6)  # supported family
        db = db._replace(vectors=jnp.asarray(vecs),
                         valid=jnp.asarray([True] * 7 + [False]))
        covis = np.zeros((K, K), np.int32)
        for a in (1, 2, 3):
            for b in (1, 2, 3):
                if a != b:
                    covis[a, b] = 100
        arena = arena._replace(covis=jnp.asarray(covis),
                               kf_valid=jnp.asarray([True] * 7 + [False]))
        ids, acc, ok = kdb.reloc_candidates(db, arena, q)
        # direct top-1 would be 5 (0.9 > 0.6); the group rule accumulates
        # 1+2+3 -> acc 1.8 vs the loner's 0.9 and must rank the family first
        assert int(ids[0]) in (1, 2, 3)


class TestPoseGraph:
    def test_loop_closure_distributes_drift(self, rng):
        # A chain of 12 poses returning to the start, with accumulated drift;
        # a loop edge between last and first should pull the chain closed.
        K = 16
        n = 12
        gt = [np.eye(4)]
        for k in range(1, n):
            ang = 2 * np.pi / n
            xi = jnp.asarray([0.5, 0, 0, 0, ang, 0], jnp.float32)
            gt.append(np.asarray(lie.se3_exp(xi) @ jnp.asarray(gt[-1])))
        gt = np.stack(gt + [np.eye(4)] * (K - n))
        # drifted estimates: inject growing error
        est = gt.copy()
        for k in range(1, n):
            drift = lie.se3_exp(jnp.asarray([0.02 * k, 0.01 * k, 0, 0, 0.01 * k, 0]))
            est[k] = np.asarray(drift @ jnp.asarray(gt[k]))
        kf_valid = jnp.asarray([True] * n + [False] * (K - n))
        parent = jnp.asarray([-1] + list(range(n - 1)) + [-1] * (K - n), jnp.int32)
        covis = jnp.zeros((K, K), jnp.int32)
        # loop edge: measurement = GT relative pose between 0 and n-1
        T_meas = jnp.asarray(gt[n - 1] @ np.linalg.inv(gt[0]))
        edges = pose_graph.build_edges(
            jnp.asarray(est), kf_valid, parent, covis,
            jnp.asarray([n - 1], jnp.int32), jnp.asarray([0], jnp.int32),
            T_meas[None], jnp.asarray([True]), max_covis_edges=4)
        out = pose_graph.optimize(jnp.asarray(est), kf_valid, edges, iters=30)
        # after optimization the loop-edge residual should be tiny
        r_end = np.asarray(lie.se3_log(
            jnp.linalg.inv(T_meas) @ (out[n - 1] @ jnp.linalg.inv(out[0]))))
        r_end_before = np.asarray(lie.se3_log(
            jnp.linalg.inv(T_meas) @ jnp.asarray(
                est[n - 1] @ np.linalg.inv(est[0]))))
        assert np.linalg.norm(r_end) < 0.1 * np.linalg.norm(r_end_before)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_no_edges_is_stable(self):
        K = 8
        poses = jnp.tile(jnp.eye(4), (K, 1, 1))
        edges = pose_graph.build_edges(
            poses, jnp.ones(K, bool), -jnp.ones(K, jnp.int32),
            jnp.zeros((K, K), jnp.int32), jnp.zeros(0, jnp.int32),
            jnp.zeros(0, jnp.int32), jnp.zeros((0, 4, 4)),
            jnp.zeros(0, bool), max_covis_edges=4)
        out = pose_graph.optimize(poses, jnp.ones(K, bool), edges, iters=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(poses), atol=1e-4)


class TestSim3Graph:
    """7-dof essential graph (Optimizer.cc:997-1260 semantics): monocular
    scale drift must distribute around the loop through the vertex scales."""

    def _circle(self, K):
        gt = []
        for k in range(K):
            a = 2 * np.pi * k / K
            Rwc = np.asarray([[np.cos(a), 0, np.sin(a)],
                              [0, 1, 0],
                              [-np.sin(a), 0, np.cos(a)]])
            cw = np.asarray([2 * np.cos(a), 0.0, 2 * np.sin(a)])
            T = np.eye(4)
            T[:3, :3] = Rwc.T
            T[:3, 3] = -Rwc.T @ cw
            gt.append(T)
        return np.asarray(gt, np.float32)

    def test_scale_drift_distributes(self):
        K = 20
        gt = self._circle(K)
        # drifted estimate: integrate relative motions with a growing scale
        # error on translation; cumulative scale at the end = 1.2
        d = 1.2 ** (1.0 / (K - 1))
        est = [gt[0]]
        for k in range(1, K):
            rel = gt[k] @ np.linalg.inv(gt[k - 1])
            rel_d = rel.copy()
            rel_d[:3, 3] *= d ** k
            est.append(rel_d @ est[-1])
        est = np.asarray(est, np.float32)
        kf_pose = jnp.asarray(est)
        kf_valid = jnp.ones(K, bool)
        parent = jnp.asarray([-1] + list(range(K - 1)), jnp.int32)
        covis = jnp.zeros((K, K), jnp.int32)
        # loop edge: true relative SE3 + the solver-measured scale 1.2
        T_loop = jnp.asarray(gt[K - 1] @ np.linalg.inv(gt[0]))
        edges = pose_graph.build_edges(
            kf_pose, kf_valid, parent, covis,
            jnp.asarray([K - 1], jnp.int32), jnp.asarray([0], jnp.int32),
            T_loop[None], jnp.asarray([True]), max_covis_edges=8,
            loop_s=jnp.asarray([1.2]))
        R, t, s = pose_graph.optimize_sim3_graph(
            kf_pose[:, :3, :3], kf_pose[:, :3, 3], jnp.ones(K), kf_valid,
            edges, fix_scale=False)
        s = np.asarray(s)
        # scales ramp smoothly to ~1.2 at the loop end
        assert abs(s[-1] / s[0] - 1.2) < 0.02
        assert np.all(np.diff(s) > -0.01)
        # recovered SE3 poses [R | t/s] beat the drifted estimate
        rec = np.zeros((K, 4, 4), np.float32)
        rec[:, :3, :3] = np.asarray(R)
        rec[:, :3, 3] = np.asarray(t) / s[:, None]
        rec[:, 3, 3] = 1

        def ate(poses):
            e = np.stack([np.linalg.inv(p)[:3, 3] for p in poses])
            g = np.stack([np.linalg.inv(p)[:3, 3] for p in gt])
            return metrics.ate_rmse(e, g)

        assert ate(rec) < 0.25 * ate(est)

    def test_fix_scale_reduces_to_se3(self):
        K = 8
        gt = self._circle(K)
        kf_pose = jnp.asarray(gt)
        kf_valid = jnp.ones(K, bool)
        parent = jnp.asarray([-1] + list(range(K - 1)), jnp.int32)
        edges = pose_graph.build_edges(
            kf_pose, kf_valid, parent, jnp.zeros((K, K), jnp.int32),
            jnp.asarray([K - 1], jnp.int32), jnp.asarray([0], jnp.int32),
            jnp.asarray(gt[K - 1] @ np.linalg.inv(gt[0]))[None],
            jnp.asarray([True]), max_covis_edges=4,
            loop_s=jnp.asarray([1.1]))
        R, t, s = pose_graph.optimize_sim3_graph(
            kf_pose[:, :3, :3], kf_pose[:, :3, 3], jnp.ones(K), kf_valid,
            edges, fix_scale=True)
        # bFixScale: every sigma frozen at 0 regardless of the loop scale
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)

    def test_sim3_log_exp_roundtrip(self, rng):
        lie_mod = lie
        xis = jnp.asarray(rng.normal(size=(16, 7)) * 0.5)
        R, t, s = lie_mod.sim3_exp(xis)
        back = lie_mod.sim3_log(R, t, s)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xis),
                                   atol=1e-5)
        # degenerate: zero tangent, pure scale, tiny angle
        for xi in [jnp.zeros(7), jnp.asarray([.1, .2, .3, 0, 0, 0, 0.4]),
                   jnp.asarray([.1, .2, .3, 1e-9, 0, 0, 0.5])]:
            R, t, s = lie_mod.sim3_exp(xi)
            np.testing.assert_allclose(np.asarray(lie_mod.sim3_log(R, t, s)),
                                       np.asarray(xi), atol=1e-6)

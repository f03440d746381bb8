"""Loop detection, Sim3/SE3 computation, and loop correction.

Re-design of the reference LoopClosing thread (LoopClosing.cc): detect
candidates via BoW (DetectLoop :103-230), geometrically validate with a
RANSAC similarity solver + guided matching (ComputeSim3 :231-400), then
correct: propagate the loop transform to the covisible group, fuse, and run
essential-graph optimization (+ global BA) (CorrectLoop :402-585, 645-750).

Host-side state machine (candidate consistency, accept/reject) around jitted
device programs (BoW scoring, dense Hamming matching, RANSAC battery, pose
graph). Runs synchronously at keyframe rate instead of on a thread — the
work itself is a handful of fused device programs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gdslam_tpu.backend import keyframe_db as kdb
from gdslam_tpu.backend import map_arena as ma
from gdslam_tpu.backend import pose_graph, solvers
from gdslam_tpu.backend import vocabulary as voc
from gdslam_tpu.config import SlamConfig
from gdslam_tpu.core import camera as cam_ops
from gdslam_tpu.core import lie
from gdslam_tpu.ops import hamming, orb as orb_ops

MIN_KF_GAP = 10          # >=10 KFs since last loop (LoopClosing.cc:110)
CONSISTENCY_TH = 3       # consecutive consistent detections (cc:43)
MIN_BOW_MATCHES = 20     # ComputeSim3 entry gate (cc:262)
MIN_ACCEPT_MATCHES = 40  # final acceptance (cc:395)


@jax.jit
def _bow_guided_matches(desc_a, valid_a, words_a, desc_b, valid_b, words_b):
    """SearchByBoW-style matching (ORBmatcher.cc:522): descriptors restricted
    to the same vocabulary word, ratio test 0.75. Dense: the word-equality
    mask replaces the feature-vector node walk."""
    pa = orb_ops.descriptors_pm1(desc_a, valid_a)
    pb = orb_ops.descriptors_pm1(desc_b, valid_b)
    D = hamming.hamming_matrix(pa, pb)
    same_word = (words_a[:, None] == words_b[None, :]) & \
        (words_a[:, None] >= 0)
    cost = jnp.where(same_word & valid_a[:, None] & valid_b[None, :],
                     D, 1 << 20)
    best, second, idx = hamming.best_two(cost, axis=1)
    good = (best < 50) & (best.astype(jnp.float32)
                          < 0.75 * jnp.minimum(second, 1 << 20).astype(jnp.float32))
    return jnp.where(good, idx, -1), jnp.sum(good)


class LoopCloser:
    def __init__(self, cfg: SlamConfig, vocab: voc.Vocabulary, kmax: int):
        self.cfg = cfg
        self.vocab = vocab
        self.db = kdb.new_db(kmax, cfg.orb.n_features, vocab.n_leaves)
        self.last_loop_kf = -MIN_KF_GAP
        self._consistent: dict[int, int] = {}   # candidate group -> streak
        self.loops: list[tuple[int, int, np.ndarray]] = []  # (cur, cand, T_meas)

    def reset(self):
        """Clear the keyframe database + consistency state (the LoopClosing
        side of System::Reset -> KeyFrameDatabase::clear)."""
        self.db = kdb.new_db(self.db.words.shape[0],
                             self.cfg.orb.n_features, self.vocab.n_leaves)
        self.last_loop_kf = -MIN_KF_GAP
        self._consistent = {}
        self.loops = []

    # ------------------------------------------------------------------ add
    def add_keyframe(self, arena: ma.MapArena, kf_id: int):
        words = voc.transform(arena.kf_desc[kf_id], self.vocab.centers,
                              self.vocab.k, self.vocab.levels)
        words = jnp.where(arena.kf_kp_valid[kf_id], words, -1)
        vec = voc.bow_vector(words, words >= 0, self.vocab.n_leaves)
        self.db = kdb.db_add(self.db, jnp.asarray(kf_id), vec, words)

    # --------------------------------------------------------------- detect
    def detect(self, arena: ma.MapArena, kf_id: int) -> Optional[int]:
        """DetectLoop host logic with consistency streaks. Returns candidate
        keyframe id or None."""
        if kf_id - self.last_loop_kf < MIN_KF_GAP:
            return None
        ids, scores, min_score = kdb.loop_candidates(self.db, arena,
                                                     jnp.asarray(kf_id))
        ids = np.asarray(ids)
        scores = np.asarray(scores)
        cand = [int(i) for i, s in zip(ids, scores)
                if s > max(float(min_score), 1e-6) and i >= 0]
        # Consistency groups: a candidate (or its covisible neighborhood)
        # must recur for CONSISTENCY_TH consecutive keyframes (cc:150-230).
        covis = np.asarray(arena.covis)
        new_streaks: dict[int, int] = {}
        accepted = None
        for c in cand:
            streak = 1
            for prev, s in self._consistent.items():
                if prev == c or covis[prev, c] > 0:
                    streak = max(streak, s + 1)
            new_streaks[c] = streak
            if streak >= CONSISTENCY_TH:
                accepted = c
        self._consistent = new_streaks
        return accepted

    # --------------------------------------------------------------- verify
    def compute_transform(self, arena: ma.MapArena, kf_id: int, cand: int):
        """ComputeSim3: BoW matches -> RANSAC rigid/sim3 -> accept.

        Returns (ok, T_cur_cand [4,4], n_inliers): T maps candidate-frame
        coords into current-frame coords."""
        cfg = self.cfg
        cam = cfg.camera
        m_idx, n_m = _bow_guided_matches(
            arena.kf_desc[kf_id], arena.kf_kp_valid[kf_id], self.db.words[kf_id],
            arena.kf_desc[cand], arena.kf_kp_valid[cand], self.db.words[cand])
        if int(n_m) < MIN_BOW_MATCHES:
            return False, None, 0
        # 3D points in each keyframe's camera from keypoint depth.
        z_a = arena.kf_depth[kf_id]
        rows = jnp.maximum(m_idx, 0)
        z_b = arena.kf_depth[cand][rows]
        ok = (m_idx >= 0) & (z_a > 0) & (z_b > 0)
        P_cand = cam_ops.backproject(arena.kf_uv[cand][rows], z_b, cam)
        Q_cur = cam_ops.backproject(arena.kf_uv[kf_id], z_a, cam)
        R, t, s, inl, n_inl, okflag = solvers.ransac_sim3(
            P_cand, Q_cur, ok, jax.random.PRNGKey(kf_id),
            n_iters=300, min_inliers=MIN_BOW_MATCHES, err_threshold=0.10,
            with_scale=False)
        if not bool(okflag) or int(n_inl) < MIN_ACCEPT_MATCHES // 2:
            return False, None, int(n_inl)
        T = lie.rt_to_mat(R, t)
        return True, T, int(n_inl)

    # -------------------------------------------------------------- correct
    def correct(self, arena: ma.MapArena, kf_id: int, cand: int,
                T_cur_cand: jnp.ndarray) -> ma.MapArena:
        """CorrectLoop: recompute the current keyframe's pose through the
        loop constraint, propagate to its covisible group and their points,
        then optimize the essential graph (Optimizer.cc:997-1260)."""
        # Pre-correction poses: the essential-graph edge measurements must be
        # taken BEFORE any loop propagation (the reference's NonCorrectedSim3,
        # LoopClosing.cc:438-470) — otherwise every edge residual is zero and
        # the optimization is a no-op. Within the rigidly-propagated covisible
        # group relative poses are unchanged, so pre-poses are valid
        # measurements for ALL tree/covis edges; the loop edge alone carries
        # the RANSAC measurement T_cur_cand.
        pose_pre = arena.kf_pose

        # Corrected current pose: T_cw_corrected = T_cur_cand @ T_cand_w.
        T_corr = T_cur_cand @ arena.kf_pose[cand]
        T_old = arena.kf_pose[kf_id]

        # Propagate to the covisible group: each group pose keeps its
        # relative transform to the current keyframe,
        # T_i_corrected = (T_i @ T_cur_old^-1) @ T_cur_corrected.
        group = (arena.covis[kf_id] > 0) | \
            (jnp.arange(arena.kmax) == kf_id)
        group = group & arena.kf_valid
        rel = jnp.einsum("kij,jl->kil", arena.kf_pose, lie.se3_inverse(T_old))
        corrected = jnp.einsum("kij,jl->kil", rel, T_corr)
        new_poses = jnp.where(group[:, None, None], corrected, arena.kf_pose)

        # Points observed by the group move with the correction.
        pt_in_group = jnp.zeros(arena.pmax, bool)
        obs = jnp.where(group[:, None], arena.kf_obs, -1)
        pt_in_group = pt_in_group.at[
            jnp.where(obs >= 0, obs, 0).reshape(-1)].max((obs >= 0).reshape(-1))
        # world correction for points: x' = inv(T_corr) @ (T_old @ x)
        M = lie.se3_inverse(T_corr) @ T_old
        moved = lie.se3_apply(M, arena.pt_pos)
        arena = arena._replace(
            kf_pose=new_poses,
            pt_pos=jnp.where(pt_in_group[:, None], moved, arena.pt_pos))

        # Essential-graph optimization: tree/covis edges measured from the
        # pre-correction poses, the loop edge from the RANSAC transform, the
        # iteration initialized at the propagated (corrected) poses — drift
        # distributes from the loop edge through the graph.
        loop_i = jnp.asarray([kf_id], jnp.int32)
        loop_j = jnp.asarray([cand], jnp.int32)
        loop_T = T_cur_cand[None]
        edges = pose_graph.build_edges(
            pose_pre, arena.kf_valid, arena.kf_parent, arena.covis,
            loop_i, loop_j, loop_T, jnp.asarray([True]))
        new_kf_pose = pose_graph.optimize(arena.kf_pose, arena.kf_valid, edges)

        # Move each point with its reference keyframe's pose change.
        ref = jnp.clip(arena.pt_ref_kf, 0, arena.kmax - 1)
        T_oldref = arena.kf_pose[ref]
        T_newref = new_kf_pose[ref]
        M_pt = jax.vmap(lambda a, b: lie.se3_inverse(b) @ a)(T_oldref, T_newref)
        new_pts = jax.vmap(lie.se3_apply)(M_pt, arena.pt_pos)
        arena = arena._replace(
            kf_pose=new_kf_pose,
            pt_pos=jnp.where(arena.pt_valid[:, None], new_pts, arena.pt_pos))

        # SearchAndFuse (LoopClosing.cc:525-560): with the poses corrected,
        # project the map into the current keyframe and its best covisible
        # neighbors and merge duplicate landmarks across the seam — the
        # loop-side and current-side copies of the same surface otherwise
        # stay as separate points that double-count observations in GBA.
        from gdslam_tpu.backend import gba, mapping
        w = np.asarray(arena.covis[kf_id])
        nbrs = [kf_id] + [int(k) for k in np.argsort(-w)[:4] if w[k] > 0]
        for k in nbrs:
            arena, _ = mapping.fuse_into_keyframe(arena, k, self.cfg)

        # Global BA after the loop (RunGlobalBundleAdjustment,
        # LoopClosing.cc:645-750) — synchronous here; the work is a handful
        # of device programs rather than a CPU thread.
        arena = gba.global_bundle_adjustment(arena, self.cfg,
                                             gate_outliers=True)

        self.last_loop_kf = kf_id
        self.loops.append((kf_id, cand, np.asarray(loop_T[0])))
        self._consistent = {}
        return arena

    # ----------------------------------------------------------------- main
    def process_keyframe(self, arena: ma.MapArena, kf_id: int) -> ma.MapArena:
        """Full per-keyframe loop-closing step (the Run loop body)."""
        self.add_keyframe(arena, kf_id)
        cand = self.detect(arena, kf_id)
        if cand is None:
            return arena
        ok, T, n_inl = self.compute_transform(arena, kf_id, cand)
        if not ok:
            return arena
        return self.correct(arena, kf_id, cand, T)

"""End-to-end loop closure: a closed-loop revisit trajectory with injected
mid-run drift; the LoopCloser fires ORGANICALLY inside the Tracking run
(detect -> consistency streak -> Sim3 verification tail -> correct), and the
correction improves the keyframe-trajectory ATE.

Reference: LoopClosing::Run (LoopClosing.cc:57-88); BASELINE config 4
(fr2_desk revisit).

Why inject drift: on the clean synthetic circuit the tracker's local-map
search basin silently re-acquires the first lap's map points at the revisit,
covisibility connects the new keyframes to the old ones, and — exactly per
the reference's DetectLoopCandidates connectivity exclusion
(KeyFrameDatabase.cc:87) — there is then no loop to close. Real sequences
drift beyond the basin; the injection reproduces that deterministically:
the recent segment's keyframes + their points + the live tracker pose are
moved by a rigid G, so the revisit cannot reconnect by matching and must go
through place recognition + geometric verification.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.backend import vocabulary as voc
from gdslam_tpu.backend.loop_closing import LoopCloser
from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.core import lie
from gdslam_tpu.io import synthetic
from gdslam_tpu.system.tracking import Tracking
from gdslam_tpu.utils import metrics

pytestmark = pytest.mark.e2e

# 320x240: the loop circuit is rotation-dominant; at 160x120 pixel
# quantization drifts tracking to LOST before the revisit.
SCAM = CameraConfig(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320,
                    height=240, bf=320.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=512, n_levels=4))
N_FRAMES = 120      # circuit period
N_RUN = 180         # 1.5 laps: the revisit segment persists long enough for
#                     the consistency streak to build
DRIFT_AT = 100      # inject drift before the revisit begins
# ~5 deg yaw + 20 cm at full strength: projects old points ~50 px off —
# beyond the local-map search basin (12 px * scale^level) so the revisit
# cannot silently rejoin.
XI_DRIFT = np.asarray([0.20, 0.05, 0.0, 0.01, 0.08, 0.0])


@pytest.fixture(scope="module")
def loop_seq():
    return [synthetic.render(synthetic.gt_pose_loop(i, N_FRAMES), SCAM,
                             False, 30.0, i) for i in range(N_RUN)]


def _kf_ate(arena, kf_timestamps):
    T0 = np.asarray(synthetic.gt_pose_loop(0, N_FRAMES))
    est, gtp = [], []
    for k, ts in enumerate(kf_timestamps):
        i = int(round(ts * 30.0))
        est.append(np.linalg.inv(np.asarray(arena.kf_pose[k]))[:3, 3])
        gtp.append((np.linalg.inv(T0)
                    @ np.asarray(synthetic.gt_pose_loop(i, N_FRAMES)))[:3, 3])
    return metrics.ate_rmse(np.asarray(est), np.asarray(gtp))


def _inject_drift(tr: Tracking, xi: np.ndarray):
    """Inject PROGRESSIVE drift: keyframe k in the second half receives
    G_k = exp(alpha_k * xi) with alpha ramping 0 -> 1, its points move with
    it, and the live tracker pose gets the full G. This models how odometry
    drift actually accumulates (smoothly along the trajectory) — a single
    cliff-step would leave every within-segment observation self-consistent
    at the *pre-correction* relative geometry, which no real drift does,
    and turns post-loop bundle adjustment into an adversary."""
    arena = tr.arena
    n = tr.n_kf_host
    k0 = n // 2
    alphas = np.zeros(arena.kmax, np.float32)
    for k in range(k0, n):
        alphas[k] = (k - k0 + 1) / (n - k0)
    Gs = np.stack([np.asarray(lie.se3_exp(jnp.asarray(a * xi, jnp.float32)))
                   for a in alphas])
    G_inv = jnp.asarray(np.linalg.inv(Gs))                  # [K, 4, 4]
    sel_kf = (jnp.arange(arena.kmax) >= k0) & arena.kf_valid
    new_kf_pose = jnp.where(
        sel_kf[:, None, None],
        jnp.einsum("kij,kjl->kil", arena.kf_pose, G_inv), arena.kf_pose)
    # each point moves with its owning keyframe's G
    ref = np.clip(np.asarray(arena.pt_ref_kf), 0, arena.kmax - 1)
    G_pt = jnp.asarray(Gs)[ref]
    sel_pt = (arena.pt_ref_kf >= k0) & arena.pt_valid
    moved = jax.vmap(lie.se3_apply)(G_pt, arena.pt_pos)
    tr.arena = arena._replace(
        kf_pose=new_kf_pose,
        pt_pos=jnp.where(sel_pt[:, None], moved, arena.pt_pos))
    G_full_inv = jnp.asarray(np.linalg.inv(Gs[n - 1]))
    tr.last = tr.last._replace(T_cw=tr.last.T_cw @ G_full_inv)


class TestLoopClosureEndToEnd:
    def test_loop_fires_and_improves_ate(self, loop_seq):
        tr = Tracking(SCFG, kmax=64, pmax=32768)
        lc = LoopCloser(SCFG, voc.default_vocabulary(), 64)
        tr.loop_closer = lc

        ates_pre = []
        orig_correct = LoopCloser.correct

        def hooked(self, arena, kf_id, cand, T):
            ates_pre.append(_kf_ate(arena, tr.kf_timestamps))
            return orig_correct(self, arena, kf_id, cand, T)

        LoopCloser.correct = hooked
        try:
            ones = jnp.ones((SCAM.height, SCAM.width))
            for i, fr in enumerate(loop_seq):
                if i == DRIFT_AT:
                    _inject_drift(tr, XI_DRIFT)
                tr.process(fr.gray, fr.depth, ones, i / 30.0)
            tr.flush()
        finally:
            LoopCloser.correct = orig_correct

        assert tr.state.name == "OK"
        # the loop must fire ORGANICALLY during tracking (not driven by the
        # test): detect -> consistency streak -> verification -> correct
        assert len(lc.loops) >= 1
        cur, cand, _ = lc.loops[0]
        # a genuine revisit: the matched keyframe is far behind the current
        assert cur - cand >= 10
        # the correction (propagation + essential graph + GBA) improves the
        # keyframe ATE over the drifted pre-correction state
        ate_post = _kf_ate(tr.arena, tr.kf_timestamps)
        assert ate_post < ates_pre[0] * 0.95

    def test_mono_scale_drift_corrected(self):
        """Monocular Sim3 loop closure (VERDICT r2 item 4): a mono run on a
        translation-dominant circuit; the final map's recent half is
        replaced by a uniform 1.2x similarity of itself (the self-consistent
        state a BA-converged scale-drifted mono map is in), cross-scale
        observations/covisibility/parents cut (real drift never has them);
        then ComputeSim3 must MEASURE the scale and CorrectLoop must
        distribute it through the 7-dof essential graph.

        The tracker's own mono scale drift over the run is machine- and
        run-dependent (XLA CPU threaded reductions change float summation
        order, and 170 chained frames amplify ULPs into percent-level map
        scale differences — observed zone ratios 0.91..1.01 across hosts),
        so every assertion is phrased RELATIVE to the natural pre-injection
        state: the measured Sim3 scale must be s_inj x the natural pair
        scale (<5% error), and the correction must remove >=50% of the
        cross-zone drift (the essential graph distributes drift along the
        tree path — by design it does not zero it; the reference's post-loop
        GBA only finishes the job where cross-zone observations exist, which
        this test surgically removes).

        Detection-by-BoW-streak is exercised organically by the RGB-D test
        above; here compute_transform/correct are driven directly on a known
        revisit pair so the scale assertion is deterministic."""
        from gdslam_tpu.backend.loop_closing import LoopCloser

        tr = Tracking(SCFG, kmax=64, pmax=32768)
        lc = LoopCloser(SCFG, voc.default_vocabulary(), 64)
        lc.fix_scale = False   # monocular semantics (Sim3Solver.h:20)
        tr.loop_closer = lc
        n_run = 170
        for i in range(n_run):
            fr = synthetic.render(synthetic.gt_pose_loop_mono(i, N_FRAMES),
                                  SCAM, False, 30.0, i)
            tr.process_mono(fr.gray, i / 30.0)
        tr.flush()
        assert tr.state.name == "OK"

        def seg_ratios(arena):
            T0 = np.asarray(synthetic.gt_pose_loop_mono(0, N_FRAMES))
            cs, gs = [], []
            for k, ts in enumerate(tr.kf_timestamps):
                i = int(round(ts * 30.0))
                cs.append(np.linalg.inv(np.asarray(arena.kf_pose[k]))[:3, 3])
                gs.append((np.linalg.inv(T0) @ np.asarray(
                    synthetic.gt_pose_loop_mono(i, N_FRAMES)))[:3, 3])
            cs, gs = np.asarray(cs), np.asarray(gs)
            de = np.linalg.norm(np.diff(cs, axis=0), axis=1)
            dg = np.linalg.norm(np.diff(gs, axis=0), axis=1)
            keep = dg > 1e-3
            return de[keep] / dg[keep], keep

        arena = tr.arena
        n = tr.n_kf_host
        k0 = n // 2
        s_inj = 1.2

        # natural (pre-injection) cross-zone ratio and pair scale
        r_nat, keep = seg_ratios(arena)
        seg_is_new = (np.arange(1, n)[keep] > k0)
        zone_nat = (np.mean(r_nat[seg_is_new])
                    / np.mean(r_nat[~seg_is_new]))
        frames = [int(round(ts * 30)) % N_FRAMES
                  for ts in tr.kf_timestamps[:n]]
        cur = n - 1
        cand = min(range(k0),
                   key=lambda k: min(abs(frames[k] - frames[cur]),
                                     N_FRAMES - abs(frames[k] - frames[cur])))
        ok_nat, _, _ = lc.compute_transform(arena, cur, cand)
        s_nat = float(lc.last_sim3[2]) if ok_nat else 1.0

        # uniform similarity of the recent segment about kf k0's center
        c0 = np.linalg.inv(np.asarray(arena.kf_pose[k0]))[:3, 3]
        poses = np.asarray(arena.kf_pose).copy()
        for k in range(k0, n):
            Twc = np.linalg.inv(poses[k])
            Twc[:3, 3] = c0 + s_inj * (Twc[:3, 3] - c0)
            poses[k] = np.linalg.inv(Twc)
        sel = (np.asarray(arena.pt_ref_kf) >= k0) & np.asarray(arena.pt_valid)
        pts = np.asarray(arena.pt_pos).copy()
        pts[sel] = c0 + s_inj * (pts[sel] - c0)
        # cut cross-scale obs / covis / parents
        obs = np.asarray(arena.kf_obs).copy()
        n_obs = np.asarray(arena.pt_n_obs).copy()
        pt_ref = np.asarray(arena.pt_ref_kf)
        for k in range(n):
            other = (pt_ref < k0) if k >= k0 else (pt_ref >= k0)
            cut = (obs[k] >= 0) & other[np.maximum(obs[k], 0)]
            n_obs[obs[k][cut]] -= 1
            obs[k][cut] = -1
        covis = np.asarray(arena.covis).copy()
        covis[:k0, k0:n] = 0
        covis[k0:n, :k0] = 0
        parent = np.asarray(arena.kf_parent).copy()
        for k in range(k0, n):
            if parent[k] < k0:
                parent[k] = k - 1
        tr.arena = arena._replace(
            kf_parent=jnp.asarray(parent), kf_pose=jnp.asarray(poses),
            pt_pos=jnp.asarray(pts), kf_obs=jnp.asarray(obs),
            pt_n_obs=jnp.asarray(np.maximum(n_obs, 0)),
            covis=jnp.asarray(covis))

        r_pre, keep = seg_ratios(tr.arena)
        seg_is_new = (np.arange(1, n)[keep] > k0)   # segment k-1 -> k
        zone_pre = (np.mean(r_pre[seg_is_new])
                    / np.mean(r_pre[~seg_is_new]))
        # the injected drift is present (exact by construction: the
        # similarity multiplies every new-zone segment by s_inj)
        assert zone_pre / zone_nat > 1.15, (zone_pre, zone_nat)

        # revisit pair: last keyframe vs the circuit-closest early keyframe
        ok, T, n_m = lc.compute_transform(tr.arena, cur, cand)
        assert ok and n_m >= 40
        # the Sim3 solver measured the injected relative scale on top of
        # whatever natural pair scale the map already had
        s_expect = s_inj * s_nat
        assert abs(float(lc.last_sim3[2]) - s_expect) / s_expect < 0.05

        arena2 = lc.correct(tr.arena, cur, cand, T)
        r_post, keep = seg_ratios(arena2)
        seg_is_new = (np.arange(1, n)[keep] > k0)
        zone_post = (np.mean(r_post[seg_is_new])
                     / np.mean(r_post[~seg_is_new]))
        # >=50% of the cross-zone scale drift removed and the residual small
        # (observed: 0.21 -> 0.057 on the virtual mesh; see docstring for why
        # full removal is not the contract on this surgically-cut map)
        assert abs(zone_post - 1.0) < 0.5 * abs(zone_pre - 1.0), \
            (zone_pre, zone_post)
        assert abs(zone_post - 1.0) < 0.10, (zone_pre, zone_post)

    def test_aliased_wrong_candidate_rejected(self, loop_seq):
        """NEGATIVE: the verification tail must reject perceptually-similar
        but geometrically wrong candidates. The synthetic circuit's texture
        aliases heavily under BoW (non-overlapping views share >=20 BoW
        matches); the Sim3 RANSAC + OptimizeSim3 + >=40-projection
        acceptance must still refuse every such pair."""
        from gdslam_tpu.backend.loop_closing import (MIN_BOW_MATCHES,
                                                     _bow_guided_matches)
        tr = Tracking(SCFG, kmax=64, pmax=32768)
        lc = LoopCloser(SCFG, voc.default_vocabulary(), 64)
        tr.loop_closer = lc
        ones = jnp.ones((SCAM.height, SCAM.width))
        # one lap only, no drift: every far-apart keyframe pair is a wrong
        # candidate (different scene content), yet BoW-aliased
        for i, fr in enumerate(loop_seq[:110]):
            tr.process(fr.gray, fr.depth, ones, i / 30.0)
        tr.flush()
        n_kf = tr.n_kf_host
        arena = tr.arena
        tried = 0
        for kf in range(n_kf - 1, n_kf - 3, -1):
            for cand in range(n_kf):
                # wrong pair: far apart on the circuit (no view overlap)
                fa = int(round(tr.kf_timestamps[kf] * 30))
                fb = int(round(tr.kf_timestamps[cand] * 30))
                sep = abs(fa - fb) % N_FRAMES
                if min(sep, N_FRAMES - sep) < 35:
                    continue
                _, n_m = _bow_guided_matches(
                    arena.kf_desc[kf], arena.kf_kp_valid[kf],
                    lc.db.words[kf], arena.kf_desc[cand],
                    arena.kf_kp_valid[cand], lc.db.words[cand])
                if int(n_m) < MIN_BOW_MATCHES:
                    continue        # not perceptually aliased enough
                ok, _, _ = lc.compute_transform(arena, kf, cand)
                assert not ok, (kf, cand)
                tried += 1
        assert tried >= 1   # the scenario actually exercised aliased pairs

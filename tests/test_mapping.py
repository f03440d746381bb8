"""Tests for backend/mapping.py (CreateNewMapPoints + MapPoint upkeep) and
the relocalization/reset additions to the tracking state machine.

Reference behaviors: LocalMapping::CreateNewMapPoints (LocalMapping.cc:
207-453), MapPoint::ComputeDistinctiveDescriptors (MapPoint.cc:242-308),
MapPoint::Replace (MapPoint.cc:177), Relocalization (Tracking.cc:1670-1832),
early-loss reset (Tracking.cc:618-626).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.backend import map_arena as ma
from gdslam_tpu.backend import mapping
from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.frontend import extractor
from gdslam_tpu.frontend.frame import build_frame
from gdslam_tpu.io import synthetic
from gdslam_tpu.system.tracking import Tracking, TrackState

SCAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                    height=120, bf=160.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=384, n_levels=4))


@pytest.fixture(scope="module")
def seq():
    return [synthetic.render_frame(i, SCAM, with_dynamic=False)
            for i in range(16)]


class TestCreateNewMapPoints:
    @pytest.mark.e2e   # minute-scale compile; full run covers it
    def test_wide_baseline_triangulation(self, seq):
        """Two depthless keyframes with a wide baseline: epipolar matching +
        DLT must create accurate new points (LocalMapping.cc:207-453). Also
        checks the baseline gate: a near-identical keyframe pair creates
        nothing (baseline < stereo baseline, LocalMapping.cc:246-268)."""
        from gdslam_tpu.system.tracking import insert_keyframe
        zdepth = jnp.zeros((120, 160))
        ones = jnp.ones((120, 160))
        T0 = np.asarray(seq[0].T_wc)

        def kf_frame(i):
            feats = extractor.extract(seq[i].gray, SCFG.orb, 120, 160)
            T_cw = jnp.asarray(np.linalg.inv(
                np.linalg.inv(T0) @ np.asarray(seq[i].T_wc)))
            return build_frame(feats, zdepth, ones, SCAM), T_cw

        arena = ma.new_arena(kmax=8, pmax=8192, n_features=384)
        none = -jnp.ones(384, jnp.int32)
        f0, Tc0 = kf_frame(0)
        f8, Tc8 = kf_frame(8)
        arena, _ = insert_keyframe(arena, f0, Tc0, none, jnp.asarray(0.0), SCFG)
        arena, _ = insert_keyframe(arena, f8, Tc8, none, jnp.asarray(0.3), SCFG)
        out = mapping.create_new_map_points(arena, 1, SCFG)
        n_new = int(jnp.sum(out.pt_valid))
        assert n_new > 40
        # accuracy: triangulated points reproject onto their keypoints and
        # sit at plausible scene depths
        pos = np.asarray(out.pt_pos)[np.asarray(out.pt_valid)]
        z = pos[:, 2]
        assert (z > 0.5).all() and (z < 6.0).all()
        # both keyframes observe the new points
        obs1 = np.asarray(out.kf_obs[1])
        assert (obs1 >= 0).sum() >= n_new

        # near-zero baseline pair -> nothing created. Mono semantics
        # (LocalMapping.cc:246-268): the gate is baseline/medianSceneDepth
        # >= 0.01 — frame 1's ~0.01-unit baseline at ~2.5-unit scene depth
        # (ratio ~0.005) must be refused, exactly as the reference refuses
        # it. (Frame 8 above passes at ratio ~0.2.)
        arena2 = ma.new_arena(kmax=8, pmax=8192, n_features=384)
        f1, Tc1 = kf_frame(0)
        # identical-view keyframe nudged by half a centimeter-equivalent:
        # below the mono parallax gate at any plausible scene depth
        Tc1 = Tc1.at[0, 3].add(0.005)
        arena2, _ = insert_keyframe(arena2, f0, Tc0, none, jnp.asarray(0.0), SCFG)
        arena2, _ = insert_keyframe(arena2, f1, Tc1, none, jnp.asarray(0.03), SCFG)
        before = int(jnp.sum(arena2.pt_valid))
        out2 = mapping.create_new_map_points(arena2, 1, SCFG)
        assert int(jnp.sum(out2.pt_valid)) == before

    @pytest.mark.e2e   # minute-scale compile; full run covers it
    def test_mono_map_grows_past_bootstrap(self, seq):
        tr = Tracking(SCFG, kmax=32, pmax=16384)
        for i, fr in enumerate(seq):
            tr.process_mono(fr.gray, i / 30.0)
        assert tr.state == TrackState.OK
        assert int(tr.arena.n_kf) > 2
        # points created by keyframes AFTER the bootstrap pair
        ref = np.asarray(tr.arena.pt_ref_kf)
        valid = np.asarray(tr.arena.pt_valid)
        assert (ref[valid] >= 2).sum() > 0


class TestPointMaintenance:
    def _arena_two_kfs(self):
        arena = ma.new_arena(kmax=4, pmax=64, n_features=8)
        key = jax.random.PRNGKey(0)
        d0 = jax.random.randint(key, (8, 32), 0, 256, jnp.int32).astype(jnp.uint8)
        d1 = d0.at[:, 0].set(255 - d0[:, 0])  # differ in byte 0 only
        # one point observed by kp 0 of both keyframes
        arena = arena._replace(
            kf_valid=arena.kf_valid.at[0].set(True).at[1].set(True),
            kf_kp_valid=arena.kf_kp_valid.at[0, 0].set(True).at[1, 0].set(True),
            kf_desc=arena.kf_desc.at[0].set(d0).at[1].set(d1),
            kf_obs=arena.kf_obs.at[0, 0].set(5).at[1, 0].set(5),
            kf_pose=arena.kf_pose.at[1, 0, 3].set(0.5),
            pt_valid=arena.pt_valid.at[5].set(True),
            pt_pos=arena.pt_pos.at[5].set(jnp.asarray([0.0, 0.0, 2.0])),
            n_kf=jnp.asarray(2, jnp.int32),
            n_pt=jnp.asarray(6, jnp.int32),
        )
        return arena, d0, d1

    def test_refresh_updates_descriptor_and_normal(self):
        arena, d0, d1 = self._arena_two_kfs()
        out = mapping.refresh_points(arena, 1, SCFG)
        # distinctive descriptor must be one of the two observations
        got = np.asarray(out.pt_desc[5])
        assert (got == np.asarray(d0[0])).all() or \
            (got == np.asarray(d1[0])).all()
        # normal: mean unit ray from both camera centers, unit length
        n = np.asarray(out.pt_normal[5])
        assert abs(np.linalg.norm(n) - 1.0) < 1e-5
        assert n[2] > 0.9  # both cameras look +z toward the point

    def test_refresh_includes_reference_keyframe_outside_window(self):
        """A point whose reference keyframe fell OUT of the recency window
        still contributes its birth-side descriptor to the median vote
        (MapPoint.cc:242-308 walks ALL observations; recency-only voting
        would bias long-lived points re-observed after a loop)."""
        window = 2
        arena = ma.new_arena(kmax=8, pmax=64, n_features=8)
        key = jax.random.PRNGKey(1)
        d_old = jax.random.randint(key, (32,), 0, 256, jnp.int32).astype(
            jnp.uint8)
        # two recent observations identical to the OLD (birth) descriptor,
        # one recent outlier: with the ref candidate in the vote, the
        # majority (3 of 4) pins the winner to the d_old appearance
        d_out = 255 - d_old
        arena = arena._replace(
            kf_valid=arena.kf_valid.at[:6].set(True),
            kf_kp_valid=arena.kf_kp_valid.at[0, 0].set(True)
            .at[4, 0].set(True).at[5, 0].set(True),
            kf_desc=arena.kf_desc.at[0, 0].set(d_old)
            .at[4, 0].set(d_out).at[5, 0].set(d_old),
            kf_obs=arena.kf_obs.at[0, 0].set(5).at[4, 0].set(5)
            .at[5, 0].set(5),
            pt_valid=arena.pt_valid.at[5].set(True),
            pt_ref_kf=arena.pt_ref_kf.at[5].set(0),
            pt_pos=arena.pt_pos.at[5].set(jnp.asarray([0.0, 0.0, 2.0])),
            n_kf=jnp.asarray(6, jnp.int32),
            n_pt=jnp.asarray(6, jnp.int32),
        )
        out = mapping.refresh_points(arena, 5, SCFG, window=window)
        got = np.asarray(out.pt_desc[5])
        assert (got == np.asarray(d_old)).all()

    def test_replace_points_redirects_observations(self):
        arena, _, _ = self._arena_two_kfs()
        # a second point (id 7) observed by kf1 kp 1
        arena = arena._replace(
            pt_valid=arena.pt_valid.at[7].set(True),
            kf_obs=arena.kf_obs.at[1, 1].set(7),
            kf_kp_valid=arena.kf_kp_valid.at[1, 1].set(True),
            pt_n_obs=arena.pt_n_obs.at[5].set(2).at[7].set(1),
        )
        out = mapping.replace_points(
            arena, jnp.asarray([7], jnp.int32), jnp.asarray([5], jnp.int32),
            jnp.asarray([True]))
        assert not bool(out.pt_valid[7])
        assert int(out.kf_obs[1, 1]) == 5
        assert int(out.pt_n_obs[5]) == 3

    def test_replace_noop_when_masked(self):
        arena, _, _ = self._arena_two_kfs()
        out = mapping.replace_points(
            arena, jnp.asarray([5], jnp.int32), jnp.asarray([3], jnp.int32),
            jnp.asarray([False]))
        assert bool(out.pt_valid[5])
        assert int(out.kf_obs[0, 0]) == 5


class TestRelocalizationAndReset:
    @pytest.mark.e2e   # minute-scale compile; full run covers it
    def test_reloc_without_vocabulary(self, seq):
        """Default System construction (no vocab): relocalization matches
        against recent keyframes with PnP (depthless query keypoints)."""
        tr = Tracking(SCFG, kmax=32, pmax=16384)
        ones = jnp.ones((120, 160))
        for i, fr in enumerate(seq):
            tr.process(fr.gray, fr.depth, ones, i / 30.0)
        assert tr.state == TrackState.OK
        # query = re-render of frame 4's view; NO depth (forces 2D-3D PnP)
        fr = seq[4]
        feats = extractor.extract(fr.gray, SCFG.orb, 120, 160)
        frame = build_frame(feats, jnp.zeros((120, 160)), ones, SCAM)
        ok, T, assoc, n_inl = tr._relocalize(frame)
        assert ok
        T0 = np.asarray(seq[0].T_wc)
        T_gt = np.linalg.inv(np.linalg.inv(T0) @ np.asarray(fr.T_wc))
        assert np.linalg.norm(np.asarray(T)[:3, 3] - T_gt[:3, 3]) < 0.08
        assert n_inl >= 50

    def test_early_loss_resets_system(self, seq):
        tr = Tracking(SCFG, kmax=32, pmax=16384)
        ones = jnp.ones((120, 160))
        for i, fr in enumerate(seq[:4]):
            tr.process(fr.gray, fr.depth, ones, i / 30.0)
        assert tr.state == TrackState.OK
        assert int(tr.arena.n_kf) <= 5
        # black frames: zero keypoints -> tracking fails -> early-loss reset
        black = jnp.zeros((120, 160))
        tr.process(black, ones * 2.0, ones, 0.5)
        assert tr.state in (TrackState.NO_IMAGES_YET,
                            TrackState.NOT_INITIALIZED)
        assert int(tr.arena.n_kf) == 0
        assert tr.kf_timestamps == []
        # system re-initializes on the next good frame
        tr.process(seq[8].gray, seq[8].depth, ones, 0.6)
        assert tr.state == TrackState.OK
        assert int(tr.arena.n_kf) == 1

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.core import lie
from gdslam_tpu.frontend import extractor, initializer
from gdslam_tpu.io import synthetic
from gdslam_tpu.ops import stereo as stereo_ops

SCAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160, height=120,
                    bf=160.0 * 0.08)   # 8 cm baseline
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=384, n_levels=4))


def render_stereo_pair(idx):
    """Left/right views with a pure x baseline."""
    T_l = synthetic.gt_pose(idx)
    baseline = jnp.eye(4).at[0, 3].set(SCAM.bf / SCAM.fx)
    T_r = T_l @ baseline
    fl = synthetic.render(T_l, SCAM, False, 30.0, idx)
    frx = synthetic.render(T_r, SCAM, False, 30.0, idx)
    return fl, frx


class TestStereoMatch:
    def test_depth_against_ground_truth(self):
        fl, frx = render_stereo_pair(0)
        A = extractor.extract(fl.gray, SCFG.orb, 120, 160)
        B = extractor.extract(frx.gray, SCFG.orb, 120, 160)
        ur, depth = stereo_ops.stereo_match(
            A.uv, A.level, A.desc, A.valid, B.uv, B.level, B.desc, B.valid,
            SCAM.bf, SCAM.bf / SCAM.fx, fl.gray, frx.gray, 1.2)
        got = np.asarray(depth)
        matched = got > 0
        assert matched.sum() > 100
        # compare against rendered GT depth at keypoint locations
        u = np.clip(np.round(np.asarray(A.uv[:, 0])).astype(int), 0, 159)
        v = np.clip(np.round(np.asarray(A.uv[:, 1])).astype(int), 0, 119)
        gt = np.asarray(fl.depth)[v, u]
        rel = np.abs(got - gt)[matched & (gt > 0)] / gt[matched & (gt > 0)]
        assert np.median(rel) < 0.05

    def test_no_matches_on_unrelated_images(self, rng):
        fl, _ = render_stereo_pair(0)
        A = extractor.extract(fl.gray, SCFG.orb, 120, 160)
        noise = jnp.asarray(rng.uniform(0, 255, (120, 160)), jnp.float32)
        B = extractor.extract(noise, SCFG.orb, 120, 160)
        ur, depth = stereo_ops.stereo_match(
            A.uv, A.level, A.desc, A.valid, B.uv, B.level, B.desc, B.valid,
            SCAM.bf, SCAM.bf / SCAM.fx, fl.gray, noise, 1.2)
        assert int((depth > 0).sum()) < 0.2 * int(A.valid.sum())


class TestInitializer:
    def test_triangulate_exact(self, rng):
        K = (160.0, 160.0, 80.0, 60.0)
        Km = np.array([[160, 0, 80], [0, 160, 60], [0, 0, 1.0]])
        X = rng.uniform([-1, -1, 2], [1, 1, 5], (50, 3))
        T21 = np.asarray(lie.se3_exp(jnp.asarray([0.3, 0, 0, 0, 0.05, 0],
                                                 jnp.float32)))
        x1 = (Km @ X.T).T
        x1 = x1[:, :2] / x1[:, 2:]
        X2 = (T21[:3, :3] @ X.T).T + T21[:3, 3]
        x2 = (Km @ X2.T).T
        x2 = x2[:, :2] / x2[:, 2:]
        P1 = Km @ np.eye(4)[:3]
        P2 = Km @ T21[:3]
        Xr = initializer.triangulate(jnp.asarray(P1), jnp.asarray(P2),
                                     jnp.asarray(x1, jnp.float32),
                                     jnp.asarray(x2, jnp.float32))
        np.testing.assert_allclose(np.asarray(Xr), X, atol=2e-2)

    def test_two_view_bootstrap_recovers_direction(self):
        # wide enough baseline for a well-conditioned F (low-parallax
        # pairs are correctly rejected / noisy, as in the reference)
        f0 = synthetic.render_frame(0, SCAM, with_dynamic=False)
        f8 = synthetic.render_frame(24, SCAM, with_dynamic=False)
        A = extractor.extract(f0.gray, SCFG.orb, 120, 160)
        B = extractor.extract(f8.gray, SCFG.orb, 120, 160)
        from gdslam_tpu.ops import hamming, orb as orb_ops
        D = hamming.hamming_matrix(orb_ops.descriptors_pm1(A.desc, A.valid),
                                   orb_ops.descriptors_pm1(B.desc, B.valid))
        best, second, idx = hamming.best_two(D, axis=1)
        good = (best < 50) & (best.astype(jnp.float32) <
                              0.9 * second.astype(jnp.float32)) & A.valid
        res = initializer.initialize(
            A.uv, B.uv[idx], good, jax.random.PRNGKey(0),
            (SCAM.fx, SCAM.fy, SCAM.cx, SCAM.cy))
        assert bool(res.ok)
        # translation direction should match ground truth up to scale
        T_gt = np.linalg.inv(np.asarray(f8.T_wc)) @ np.asarray(f0.T_wc)
        t_gt = T_gt[:3, 3] / (np.linalg.norm(T_gt[:3, 3]) + 1e-12)
        t_est = np.asarray(res.T_21)[:3, 3]
        t_est = t_est / (np.linalg.norm(t_est) + 1e-12)
        assert abs(float(np.dot(t_gt, t_est))) > 0.85
        # rotation close to GT
        dR = np.asarray(res.T_21)[:3, :3] @ T_gt[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 3.0


class TestStereoMonoPipelines:
    def test_stereo_tracking_few_frames(self):
        from gdslam_tpu.system.tracking import Tracking
        tr = Tracking(SCFG, kmax=32, pmax=16384)
        errs = []
        T0 = None
        for i in range(6):
            fl, frx = render_stereo_pair(i)
            T = tr.process_stereo(fl.gray, frx.gray, None, i / 30.0)
            if T0 is None:
                T0 = np.asarray(fl.T_wc)
            gt_rel = np.linalg.inv(T0) @ np.asarray(fl.T_wc)
            errs.append(np.linalg.norm(np.linalg.inv(T)[:3, 3] - gt_rel[:3, 3]))
        assert tr.state.name == "OK"
        # tiny-rig stereo (384 feats, 160x120, ~140 stereo points) drifts
        # ~1 cm/frame; this bound catches structural breakage
        assert errs[-1] < 0.10

    def test_mono_bootstrap_and_track(self):
        from gdslam_tpu.system.tracking import Tracking
        tr = Tracking(SCFG, kmax=32, pmax=16384)
        states = []
        for i in range(0, 14, 2):
            fr = synthetic.render_frame(i, SCAM, with_dynamic=False)
            tr.process_mono(fr.gray, i / 30.0)
            states.append(tr.state.name)
        assert "OK" in states

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.backend import optimizer, solvers
from gdslam_tpu.core import lie

K = (535.4, 539.2, 320.1, 247.6)
BF = 40.0


def make_problem(rng, n=200, noise_px=0.5, outlier_frac=0.0, stereo=True):
    pw = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 5.0], size=(n, 3)).astype(np.float32)
    xi = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], np.float32)
    T_cw = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    pc = (T_cw[:3, :3] @ pw.T).T + T_cw[:3, 3]
    u = K[0] * pc[:, 0] / pc[:, 2] + K[2] + rng.normal(0, noise_px, n)
    v = K[1] * pc[:, 1] / pc[:, 2] + K[3] + rng.normal(0, noise_px, n)
    ur = u - BF / pc[:, 2] + rng.normal(0, noise_px, n)
    n_out = int(n * outlier_frac)
    if n_out:
        u[:n_out] += rng.uniform(30, 100, n_out) * rng.choice([-1, 1], n_out)
        v[:n_out] += rng.uniform(30, 100, n_out) * rng.choice([-1, 1], n_out)
    obs = optimizer.PoseObs(
        pw=jnp.asarray(pw),
        uv=jnp.asarray(np.stack([u, v], 1), jnp.float32),
        ur=jnp.asarray(ur, jnp.float32) if stereo else -jnp.ones(n),
        inv_sigma2=jnp.ones(n),
        valid=jnp.ones(n, bool),
    )
    return obs, jnp.asarray(T_cw), n_out


class TestPoseOptimization:
    def test_converges_from_identity(self, rng):
        obs, T_gt, _ = make_problem(rng)
        T, inl, n_inl = optimizer.pose_optimization(jnp.eye(4), obs, K, BF)
        err = np.asarray(lie.se3_log(lie.se3_inverse(T) @ T_gt))
        assert np.abs(err).max() < 5e-3
        assert int(n_inl) > 180

    def test_rejects_outliers(self, rng):
        obs, T_gt, n_out = make_problem(rng, outlier_frac=0.3)
        T, inl, n_inl = optimizer.pose_optimization(jnp.eye(4), obs, K, BF)
        err = np.asarray(lie.se3_log(lie.se3_inverse(T) @ T_gt))
        assert np.abs(err).max() < 1e-2
        # outliers (first n_out) must be classified out
        assert not np.asarray(inl)[:n_out].any()

    def test_mono_only(self, rng):
        obs, T_gt, _ = make_problem(rng, stereo=False)
        T, _, n_inl = optimizer.pose_optimization(jnp.eye(4), obs, K, BF)
        err = np.asarray(lie.se3_log(lie.se3_inverse(T) @ T_gt))
        assert np.abs(err).max() < 1e-2

    def test_padded_invalid_ignored(self, rng):
        obs, T_gt, _ = make_problem(rng, n=100)
        # pad with garbage marked invalid
        pad = optimizer.PoseObs(
            pw=jnp.concatenate([obs.pw, jnp.full((50, 3), jnp.nan)]),
            uv=jnp.concatenate([obs.uv, jnp.zeros((50, 2))]),
            ur=jnp.concatenate([obs.ur, jnp.zeros(50)]),
            inv_sigma2=jnp.concatenate([obs.inv_sigma2, jnp.ones(50)]),
            valid=jnp.concatenate([obs.valid, jnp.zeros(50, bool)]),
        )
        # NaNs in padded slots must not poison the solve: weights zero them
        pad = pad._replace(pw=jnp.where(pad.valid[:, None], pad.pw, 0.0))
        T, _, n_inl = optimizer.pose_optimization(jnp.eye(4), pad, K, BF)
        err = np.asarray(lie.se3_log(lie.se3_inverse(T) @ T_gt))
        assert np.abs(err).max() < 1e-2
        assert int(n_inl) <= 100


class TestHorn:
    def test_exact_recovery(self, rng):
        P = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
        xi = jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32)
        T = lie.se3_exp(xi)
        Q = lie.se3_apply(T, P)
        R, t, s = solvers.horn_alignment(P, Q, jnp.ones(20))
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-5)
        np.testing.assert_allclose(t, T[:3, 3], atol=1e-5)
        assert float(s) == 1.0

    def test_with_scale(self, rng):
        P = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
        Q = 1.7 * P + jnp.array([1.0, 2.0, 3.0])
        R, t, s = solvers.horn_alignment(P, Q, jnp.ones(20), with_scale=True)
        np.testing.assert_allclose(float(s), 1.7, atol=1e-4)
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-4)

    def test_weights_ignore_outliers(self, rng):
        P = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
        T = lie.se3_exp(jnp.asarray([0.2, 0, 0, 0, 0.1, 0], jnp.float32))
        Q = lie.se3_apply(T, P)
        Q = Q.at[0].set(jnp.array([100.0, -50, 20]))
        w = jnp.ones(20).at[0].set(0.0)
        R, t, _ = solvers.horn_alignment(P, Q, w)
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-5)


class TestRansac:
    def test_recovers_pose_with_outliers(self, rng):
        n = 300
        P = jnp.asarray(rng.uniform([-2, -1.5, 1.5], [2, 1.5, 4.0], (n, 3)), jnp.float32)
        T = lie.se3_exp(jnp.asarray([0.15, -0.05, 0.1, 0.03, -0.02, 0.05], jnp.float32))
        Q = lie.se3_apply(T, P)
        # 40% outliers
        n_out = 120
        Q = Q.at[:n_out].add(jnp.asarray(rng.uniform(0.5, 2.0, (n_out, 3)), jnp.float32))
        u = 535.4 * Q[:, 0] / Q[:, 2] + 320.1
        v = 539.2 * Q[:, 1] / Q[:, 2] + 247.6
        uv_q = jnp.stack([u, v], 1)
        res = solvers.ransac_rigid(P, Q, jnp.ones(n, bool), jax.random.PRNGKey(0),
                                   K, uv_q)
        assert bool(res.ok)
        err = np.asarray(lie.se3_log(lie.se3_inverse(res.T) @ T))
        assert np.abs(err).max() < 2e-2
        assert int(res.n_inliers) > 150

    def test_sim3_ransac(self, rng):
        n = 100
        P = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        xi = jnp.asarray([0.3, 0.1, -0.2, 0.1, 0.05, -0.1, 0.0], jnp.float32)
        R_gt, t_gt, s_gt = lie.sim3_exp(xi)
        Q = lie.sim3_apply(R_gt, t_gt, s_gt, P)
        Q = Q.at[:30].add(1.0)  # outliers
        R, t, s, inl, n_inl, ok = solvers.ransac_sim3(
            P, Q, jnp.ones(n, bool), jax.random.PRNGKey(1))
        assert bool(ok)
        np.testing.assert_allclose(R, R_gt, atol=1e-4)
        assert int(n_inl) >= 70

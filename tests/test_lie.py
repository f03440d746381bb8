import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.core import lie


def random_se3(rng, n=8, scale=1.0):
    xi = rng.normal(size=(n, 6)) * scale
    return jnp.asarray(xi, dtype=jnp.float32)


class TestSO3:
    def test_exp_is_rotation(self, rng):
        w = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        R = lie.so3_exp(w)
        eye = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2),
                                   jnp.broadcast_to(eye, R.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(32, 3)) * 0.8, jnp.float32)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w, w2, atol=2e-4)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]], jnp.float32)
        R = lie.so3_exp(w)
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-7)

    def test_matches_rodrigues(self, rng):
        # Golden check against a hand-rolled numpy Rodrigues
        w = rng.normal(size=(3,)).astype(np.float32)
        theta = np.linalg.norm(w)
        k = w / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R_np = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        np.testing.assert_allclose(lie.so3_exp(jnp.asarray(w)), R_np, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = random_se3(rng, 32, 0.7)
        xi2 = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(xi, xi2, atol=3e-4)

    def test_inverse(self, rng):
        T = lie.se3_exp(random_se3(rng, 8))
        TT = T @ lie.se3_inverse(T)
        np.testing.assert_allclose(TT, jnp.broadcast_to(jnp.eye(4), TT.shape), atol=1e-5)

    def test_apply(self, rng):
        T = lie.se3_exp(random_se3(rng, 1))[0]
        p = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        q = lie.se3_apply(T, p)
        q_ref = (np.asarray(T[:3, :3]) @ np.asarray(p).T).T + np.asarray(T[:3, 3])
        np.testing.assert_allclose(q, q_ref, atol=1e-5)

    def test_jit_and_vmap(self, rng):
        xi = random_se3(rng, 4)
        f = jax.jit(jax.vmap(lie.se3_exp))
        np.testing.assert_allclose(f(xi[:, None, :])[:, 0], lie.se3_exp(xi), atol=1e-6)


class TestSim3:
    def test_reduces_to_se3_at_zero_sigma(self, rng):
        xi6 = random_se3(rng, 8, 0.5)
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1), jnp.float32)], axis=-1)
        R, t, s = lie.sim3_exp(xi7)
        T = lie.se3_exp(xi6)
        np.testing.assert_allclose(s, jnp.ones(8), atol=1e-6)
        np.testing.assert_allclose(R, T[:, :3, :3], atol=1e-5)
        np.testing.assert_allclose(t, T[:, :3, 3], atol=1e-4)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(4, 7)) * 0.5, jnp.float32)
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(tc, jnp.zeros_like(tc), atol=1e-5)
        np.testing.assert_allclose(sc, jnp.ones_like(sc), atol=1e-5)

    def test_apply_scales(self):
        R = jnp.eye(3)
        t = jnp.zeros(3)
        p = jnp.array([1.0, 2.0, 3.0])
        q = lie.sim3_apply(R, t, 2.0, p)
        np.testing.assert_allclose(q, 2 * p, atol=1e-6)


class TestQuat:
    def test_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        R = lie.so3_exp(w)
        R2 = lie.quat_to_mat(lie.mat_to_quat(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_identity(self):
        q = lie.mat_to_quat(jnp.eye(3))
        np.testing.assert_allclose(q, jnp.array([0, 0, 0, 1.0]), atol=1e-6)

    def test_euler_identity(self):
        e = lie.rotm_to_euler(jnp.eye(3))
        np.testing.assert_allclose(e, jnp.zeros(3), atol=1e-6)


class TestCamera:
    def test_project_backproject(self, rng):
        from gdslam_tpu.core import camera
        from gdslam_tpu.config import CameraConfig
        cam = CameraConfig()
        uv = jnp.asarray(rng.uniform(0, 640, size=(100, 2)), jnp.float32)
        z = jnp.asarray(rng.uniform(0.5, 5.0, size=(100,)), jnp.float32)
        pts = camera.backproject(uv, z, cam)
        uv2, z2 = camera.project(pts, cam)
        np.testing.assert_allclose(uv, uv2, atol=1e-3)
        np.testing.assert_allclose(z, z2, atol=1e-5)

    def test_distort_undistort(self, rng):
        from gdslam_tpu.core import camera
        d = jnp.array([0.26, -0.95, -0.005, 0.003, 1.16], jnp.float32)  # TUM1-like
        xy = jnp.asarray(rng.uniform(-0.3, 0.3, size=(64, 2)), jnp.float32)
        xy_d = camera.distort_normalized(xy, d)
        xy2 = camera.undistort_normalized(xy_d, d, iters=20)
        np.testing.assert_allclose(xy, xy2, atol=1e-4)

    def test_lut_shape_identity_when_undistorted(self):
        from gdslam_tpu.core import camera
        from gdslam_tpu.config import CameraConfig
        cam = CameraConfig(width=64, height=48)
        lut = camera.undistort_lut(cam)
        assert lut.shape == (48, 64, 2)
        np.testing.assert_allclose(lut[10, 20], jnp.array([20.0, 10.0]), atol=1e-5)

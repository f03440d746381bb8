import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.config import CameraConfig, OrbConfig
from gdslam_tpu.core import camera, lie
from gdslam_tpu.frontend import extractor
from gdslam_tpu.io import synthetic
from gdslam_tpu.ops import fast as fast_ops
from gdslam_tpu.ops import hamming, image, orb

CAM = CameraConfig()
ORB = OrbConfig()


@pytest.fixture(scope="module")
def frame0():
    return synthetic.render_frame(0, CAM, with_dynamic=False)


@pytest.fixture(scope="module")
def feats0(frame0):
    return extractor.extract(frame0.gray, ORB, CAM.height, CAM.width)


class TestImageOps:
    def test_gaussian_blur_preserves_mean_of_constant(self):
        img = jnp.full((32, 48), 7.0)
        out = image.gaussian_blur(img)
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_blur_matches_numpy_separable(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, (40, 56)), jnp.float32)
        out = np.asarray(image.gaussian_blur(img, 7, 2.0))
        k = np.asarray(image.gaussian_kernel_1d(7, 2.0))
        ref = np.pad(np.asarray(img), 3, mode="reflect")
        ref = np.apply_along_axis(lambda r: np.convolve(r, k[::-1], "valid"), 0, ref)
        ref = np.apply_along_axis(lambda r: np.convolve(r, k[::-1], "valid"), 1, ref)
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_bilinear_sample_exact_on_grid(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (16, 16)), jnp.float32)
        uv = jnp.array([[3.0, 5.0], [0.0, 0.0], [15.0, 15.0]])
        vals = image.bilinear_sample(img, uv)
        np.testing.assert_allclose(
            vals, [img[5, 3], img[0, 0], img[15, 15]], atol=1e-6)

    def test_bilinear_out_of_bounds_fill(self):
        img = jnp.ones((8, 8))
        vals = image.bilinear_sample(img, jnp.array([[-2.0, 4.0], [4.0, 9.0]]), fill=0.0)
        np.testing.assert_allclose(vals, [0.0, 0.0])

    def test_pyramid_shapes(self):
        shapes = image.pyramid_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        assert len(shapes) == 8

    def test_pyramid_level_content(self, frame0):
        canvas, shapes = image.build_pyramid(frame0.gray, 480, 640, 8, 1.2)
        h, w = shapes[3]
        level = np.asarray(canvas[3])
        assert np.abs(level[:h, :w]).sum() > 0
        assert np.abs(level[h:, :]).sum() == 0  # padding stays zero


class TestFast:
    def test_detects_synthetic_corner(self):
        # A bright square on dark background: corners of the square are FAST corners.
        img = jnp.zeros((32, 32)).at[10:20, 10:20].set(200.0)
        score = fast_ops.fast_score(img, 20.0)
        assert float(score.max()) > 0
        corners = fast_ops.nms3x3(score)
        ys, xs = np.nonzero(np.asarray(corners))
        # all detections near the 4 square corners
        for y, x in zip(ys, xs):
            d = min(abs(y - 10) + abs(x - 10), abs(y - 10) + abs(x - 19),
                    abs(y - 19) + abs(x - 10), abs(y - 19) + abs(x - 19))
            assert d <= 4

    def test_flat_image_no_corners(self):
        img = jnp.full((32, 32), 100.0)
        assert float(fast_ops.fast_score(img, 7.0).max()) == 0.0

    def test_score_monotone_in_threshold(self, frame0):
        s20 = fast_ops.fast_score(frame0.gray, 20.0)
        s7 = fast_ops.fast_score(frame0.gray, 7.0)
        assert int((s7 > 0).sum()) >= int((s20 > 0).sum())

    def test_arc9_requires_contiguity(self):
        # Construct a 16-mask with 8 alternating bits: no 9-run.
        m = jnp.zeros((16, 1, 1), bool).at[::2].set(True)
        assert not bool(fast_ops._has_arc9(m)[0, 0])
        m = jnp.zeros((16, 1, 1), bool).at[:9].set(True)
        assert bool(fast_ops._has_arc9(m)[0, 0])
        # wrap-around run
        m = jnp.zeros((16, 1, 1), bool).at[12:].set(True).at[:5].set(True)
        assert bool(fast_ops._has_arc9(m)[0, 0])


class TestOrb:
    def test_quotas_sum(self):
        q = orb.feature_quotas(1500, 8, 1.2)
        assert sum(q) == 1500
        assert q[0] > q[-1]

    def test_pack_unpack_roundtrip(self, rng):
        bits = jnp.asarray(rng.integers(0, 2, (10, 256)), bool)
        np.testing.assert_array_equal(orb.unpack_bits(orb.pack_bits(bits)), bits)

    def test_ic_angle_gradient_direction(self):
        # Horizontal intensity ramp -> centroid along +x -> angle ~ 0
        img = jnp.tile(jnp.arange(64, dtype=jnp.float32)[None], (64, 1))
        ang = orb.ic_angle(img, jnp.array([[32.0, 32.0]]))
        assert abs(float(ang[0])) < 0.05
        # Vertical ramp -> angle ~ pi/2
        ang2 = orb.ic_angle(img.T, jnp.array([[32.0, 32.0]]))
        assert abs(float(ang2[0]) - np.pi / 2) < 0.05

    def test_descriptor_rotation_invariance(self, frame0):
        # The same keypoint with angle measured on a rotated image should give
        # a similar descriptor (rBRIEF's whole purpose). 180-degree rotation
        # keeps the pixel grid exact.
        img = image.gaussian_blur(frame0.gray)
        uv = jnp.array([[320.0, 240.0], [300.0, 200.0]])
        ang = orb.ic_angle(frame0.gray, uv)
        d1 = orb.brief_descriptors(img, uv, ang)
        rot = img[::-1, ::-1]
        uv_r = jnp.stack([639.0 - uv[:, 0], 479.0 - uv[:, 1]], axis=1)
        ang_r = orb.ic_angle(frame0.gray[::-1, ::-1], uv_r)
        d2 = orb.brief_descriptors(rot, uv_r, ang_r)
        dist = hamming.hamming_packed(d1, d2)
        assert float(dist.max()) < 40  # well under random (128)


class TestHamming:
    def test_popcount(self):
        x = jnp.asarray([0, 1, 255, 0b1010101], jnp.uint8)
        np.testing.assert_array_equal(hamming.popcount_u8(x), [0, 1, 8, 4])

    def test_matrix_equals_packed(self, rng):
        a = jnp.asarray(rng.integers(0, 256, (7, 32)), jnp.uint8)
        b = jnp.asarray(rng.integers(0, 256, (9, 32)), jnp.uint8)
        ref = np.zeros((7, 9), np.int32)
        for i in range(7):
            for j in range(9):
                ref[i, j] = int(hamming.hamming_packed(a[i], b[j]))
        pa = orb.descriptors_pm1(a)
        pb = orb.descriptors_pm1(b)
        np.testing.assert_array_equal(hamming.hamming_matrix(pa, pb), ref)

    def test_invalid_rows_get_mid_distance(self):
        a = jnp.zeros((2, 32), jnp.uint8)
        pa = orb.descriptors_pm1(a, valid=jnp.array([True, False]))
        pb = orb.descriptors_pm1(a, valid=jnp.array([True]))
        D = hamming.hamming_matrix(pa, pb)
        assert int(D[0, 0]) == 0
        assert int(D[1, 0]) == 128


class TestExtractor:
    def test_full_budget_on_textured_scene(self, feats0):
        assert int(feats0.valid.sum()) == ORB.n_features

    def test_level_quotas_respected(self, feats0):
        hist = np.bincount(np.asarray(feats0.level[feats0.valid]), minlength=8)
        q = orb.feature_quotas(ORB.n_features, 8, 1.2)
        assert (hist <= np.asarray(q)).all()

    def test_keypoints_inside_image(self, feats0):
        uv = np.asarray(feats0.uv[feats0.valid])
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 640).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 480).all()

    def test_two_view_matching_geometry(self, frame0):
        f1 = synthetic.render_frame(3, CAM, with_dynamic=False)
        A = extractor.extract(frame0.gray, ORB, CAM.height, CAM.width)
        B = extractor.extract(f1.gray, ORB, CAM.height, CAM.width)
        D = hamming.hamming_matrix(orb.descriptors_pm1(A.desc, A.valid),
                                   orb.descriptors_pm1(B.desc, B.valid))
        best, second, idx = hamming.best_two(D, axis=1)
        good = np.asarray((best < 50) & (best < 0.7 * second) & A.valid)
        assert good.sum() > 500
        zA = frame0.depth[jnp.clip(A.uv[:, 1].astype(int), 0, 479),
                          jnp.clip(A.uv[:, 0].astype(int), 0, 639)]
        PA = camera.backproject(A.uv, zA, CAM)
        T_rel = lie.se3_inverse(f1.T_wc) @ frame0.T_wc
        uvB, _ = camera.project(lie.se3_apply(T_rel, PA), CAM)
        err = np.asarray(jnp.linalg.norm(uvB - B.uv[idx], axis=1))[good]
        assert np.median(err) < 1.0
        assert (err < 2.0).mean() > 0.85


class TestSynthetic:
    def test_depth_consistency_with_reprojection(self, frame0):
        # Backproject frame0, transform to frame5, compare against frame5's depth.
        f5 = synthetic.render_frame(5, CAM, with_dynamic=False)
        H, W = 480, 640
        vv, uu = jnp.mgrid[100:400:50, 100:600:50]
        uv = jnp.stack([uu.ravel(), vv.ravel()], -1).astype(jnp.float32)
        z = frame0.depth[vv.ravel(), uu.ravel()]
        P0 = camera.backproject(uv, z, CAM)
        T_rel = lie.se3_inverse(f5.T_wc) @ frame0.T_wc
        P5 = lie.se3_apply(T_rel, P0)
        uv5, z5 = camera.project(P5, CAM)
        inb = (uv5[:, 0] > 2) & (uv5[:, 0] < W - 3) & (uv5[:, 1] > 2) & (uv5[:, 1] < H - 3)
        z_obs = image.bilinear_sample(f5.depth, uv5)
        rel_err = np.asarray(jnp.abs(z_obs - z5) / z5)[np.asarray(inb)]
        # most points agree (occlusion boundaries may differ)
        assert np.median(rel_err) < 0.02

    def test_dynamic_mask_present(self):
        fr = synthetic.render_frame(0, CAM, with_dynamic=True)
        assert int(fr.dyn_mask.sum()) > 1000

    def test_gt_trajectory_shape(self):
        T = synthetic.gt_trajectory(10)
        assert T.shape == (10, 4, 4)
        np.testing.assert_allclose(np.asarray(T[0, 3]), [0, 0, 0, 1], atol=1e-6)

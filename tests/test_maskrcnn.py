import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.models import maskrcnn as mrc


class TestComponents:
    def test_anchors_cover_image(self):
        a = mrc.generate_anchors((128, 160))
        assert a.shape[1] == 4
        centers_y = (a[:, 0] + a[:, 2]) / 2
        assert centers_y.min() >= 0 and centers_y.max() <= 128

    def test_apply_deltas_identity(self):
        boxes = jnp.asarray([[10.0, 20, 50, 80]])
        out = mrc.apply_deltas(boxes, jnp.zeros((1, 4)))
        np.testing.assert_allclose(out, boxes, atol=1e-5)

    def test_iou(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[0.0, 0, 10, 10], [5.0, 5, 15, 15], [20.0, 20, 30, 30]])
        iou = np.asarray(mrc.box_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-5)

    def test_nms_suppresses_overlaps(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [1.0, 1, 11, 11],
                             [20.0, 20, 30, 30]])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep = np.asarray(mrc.nms_fixed(boxes, scores, 0.5, 3))
        assert keep[0] == 0
        assert keep[1] == 2
        assert keep[2] == -1


class TestModelSmoke:
    @pytest.fixture(scope="class")
    def small_model(self):
        hw = (128, 160)
        model = mrc.MaskRCNN(image_hw=hw, pre_nms=128, post_nms=16, max_det=8)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros(hw + (3,)))
        return model, params, hw

    def test_forward_shapes(self, small_model, rng):
        model, params, hw = small_model
        img = jnp.asarray(rng.uniform(0, 255, hw + (3,)), jnp.float32)
        det = model.apply(params, img)
        assert det["boxes"].shape == (8, 4)
        assert det["masks"].shape == (8, 28, 28)
        assert det["classes"].shape == (8,)
        assert bool(jnp.all(jnp.isfinite(det["boxes"])))

    def test_paste_masks_shape_and_range(self, small_model, rng):
        model, params, hw = small_model
        img = jnp.asarray(rng.uniform(0, 255, hw + (3,)), jnp.float32)
        det = model.apply(params, img, score_th=0.0)
        m = mrc.paste_masks(det, hw)
        assert m.shape == hw
        assert float(m.min()) >= 0 and float(m.max()) <= 1

    def test_segmenter_callable(self, small_model):
        model, params, hw = small_model
        seg = mrc.FlaxSegmenter(params=params, image_hw=hw)
        out = seg(np.zeros(hw + (3,), np.float32))
        assert out.shape == hw


class TestMaskNetBridge:
    def test_cache_roundtrip(self, tmp_path, rng):
        from gdslam_tpu.masking.masknet import SegmentDynObject
        calls = []

        def fake_seg(rgb):
            calls.append(1)
            m = np.zeros(rgb.shape[:2], np.float32)
            m[10:20, 10:20] = 1.0
            return m

        s = SegmentDynObject(fake_seg, cache_dir=str(tmp_path))
        rgb = rng.uniform(0, 255, (48, 64, 3)).astype(np.float32)
        m1 = s.get_segmentation(rgb, "frame0")
        n_after_first = len(calls)
        m2 = s.get_segmentation(rgb, "frame0")   # cache hit -> no new call
        assert len(calls) == n_after_first
        np.testing.assert_allclose(m1, m2)

    def test_no_save_sentinel(self, tmp_path):
        from gdslam_tpu.masking.masknet import NO_SAVE, SegmentDynObject
        s = SegmentDynObject(lambda rgb: np.zeros(rgb.shape[:2], np.float32),
                             cache_dir=NO_SAVE)
        m = s.get_segmentation(np.zeros((32, 32, 3), np.float32), "x")
        assert m.shape == (32, 32)

    def test_label_components(self):
        from gdslam_tpu.masking.masknet import SegmentDynObject

        def seg(rgb):
            m = np.zeros(rgb.shape[:2], np.float32)
            m[2:8, 2:8] = 1.0
            m[20:28, 20:28] = 1.0
            return m

        s = SegmentDynObject(seg)
        mask, labels = s.get_segmentation_label(np.zeros((32, 32, 3), np.float32))
        assert labels.max() == 2   # two instances

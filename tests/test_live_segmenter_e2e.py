"""Live-segmenter driver path: the reference runs Mask R-CNN on every
mask-cache miss (MaskNet.cc:86-93, called from rgbd_tum.cc:144). Here a
toy-trained Flax Mask R-CNN is wired into cli/rgbd_tum via --segmenter:
the driver must run it live on cache misses, write masks back to the
cache, and the produced masks + trajectory must pass quality gates."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from gdslam_tpu.config import CameraConfig
from gdslam_tpu.io import synthetic
from gdslam_tpu.utils import metrics

pytestmark = pytest.mark.e2e

SCAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                    height=120, bf=160.0 * 0.08)
N_FRAMES = 14
HW = (120, 160)

SETTINGS_YAML = """%YAML:1.0
Camera.fx: 160.0
Camera.fy: 160.0
Camera.cx: 80.0
Camera.cy: 60.0
Camera.width: 160
Camera.height: 120
Camera.fps: 30.0
Camera.bf: 12.8
Camera.RGB: 1
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 384
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
"""


def _train_toy_segmenter(frames, path):
    """Fit a small Mask R-CNN on the renderer's ground truth (the moving
    sphere as a 'person') and save it with shape metadata."""
    import gdslam_tpu.models.maskrcnn as mrc
    imgs, boxes, classes, masks, valids = [], [], [], [], []
    for fr in frames:
        dyn = np.asarray(fr.dyn_mask)
        ys, xs = np.nonzero(dyn)
        if len(ys) < 30:
            continue
        imgs.append(np.asarray(fr.rgb, np.float32))
        boxes.append([[float(ys.min()), float(xs.min()),
                       float(ys.max() + 1), float(xs.max() + 1)]])
        classes.append([1])          # person: a DYNAMIC_CLASS_ID
        masks.append(dyn.astype(np.float32))
        valids.append([True])
    model = mrc.MaskRCNN(image_hw=HW, blocks=(1, 1, 1, 1),
                         pre_nms=256, post_nms=32, max_det=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(HW + (3,)))
    trained = mrc.train_toy(model, variables, jnp.asarray(np.stack(imgs)),
                            jnp.asarray(boxes, jnp.float32),
                            jnp.asarray(classes, jnp.int32),
                            jnp.asarray(np.stack(masks)),
                            jnp.asarray(valids), steps=150, lr=2e-3)
    mrc.save_variables(trained, path,
                       meta={"blocks": [1, 1, 1, 1], "infer_hw": list(HW)})


@pytest.fixture(scope="module")
def seq_with_weights(tmp_path_factory):
    root = tmp_path_factory.mktemp("live_seg")
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    os.makedirs(root / "mask_cache")
    frames, assoc, gts = [], [], []
    for i in range(N_FRAMES):
        fr = synthetic.render_frame(i, SCAM, with_dynamic=True)
        frames.append(fr)
        ts = 1305031790.0 + i / 30.0
        name = f"{ts:.6f}.png"
        Image.fromarray(np.asarray(fr.rgb).astype(np.uint8)).save(
            root / "rgb" / name)
        d16 = (np.asarray(fr.depth) * 5000.0).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(root / "depth" / name)
        assoc.append(f"{ts:.6f} rgb/{name} {ts:.6f} depth/{name}")
        gts.append(np.asarray(fr.T_wc))
    with open(root / "assoc.txt", "w") as f:
        f.write("\n".join(assoc) + "\n")
    with open(root / "settings.yaml", "w") as f:
        f.write(SETTINGS_YAML)
    w = str(root / "toy_segmenter.npz")
    _train_toy_segmenter(frames, w)
    return str(root), gts, w, frames


def test_live_segmenter_in_driver(seq_with_weights, tmp_path, monkeypatch):
    from gdslam_tpu.cli import rgbd_tum
    seq_dir, gts, weights, frames = seq_with_weights
    monkeypatch.chdir(tmp_path)
    cache = os.path.join(seq_dir, "mask_cache")
    rc = rgbd_tum.main(["none", os.path.join(seq_dir, "settings.yaml"),
                        seq_dir, os.path.join(seq_dir, "assoc.txt"),
                        cache, "--segmenter", f"flax:{weights}"])
    assert rc == 0
    # every cache miss ran the live net and wrote the mask back
    cached = sorted(os.listdir(cache))
    assert len(cached) == N_FRAMES
    # the produced masks flag a meaningful part of the dynamic sphere
    recalls = []
    for i, fr in enumerate(frames):
        ts = 1305031790.0 + i / 30.0
        m = np.asarray(Image.open(os.path.join(cache, f"{ts:.6f}.png")),
                       np.float32)
        dyn_est = m > 127
        dyn_gt = np.asarray(fr.dyn_mask)
        if dyn_gt.sum() > 30:
            recalls.append((dyn_est & dyn_gt).sum() / dyn_gt.sum())
    assert np.mean(recalls) > 0.3, f"mean mask recall {np.mean(recalls):.2f}"
    # trajectory gate (semantic masking + geometry path on a dynamic scene)
    rows = [l.split() for l in
            open("CameraTrajectory.txt").read().strip().splitlines()]
    assert len(rows) >= N_FRAMES - 3
    T0 = gts[0]
    est = np.asarray([[float(x) for x in r[1:4]] for r in rows])
    gtp = np.asarray([(np.linalg.inv(T0) @ gts[int(round(
        (float(r[0]) - 1305031790.0) * 30.0))])[:3, 3] for r in rows])
    assert metrics.ate_rmse(est, gtp) < 0.30

"""Driver-path end-to-end test: run `cli/rgbd_tum.main` over a generated
TUM-layout sequence (assoc parsing, mask cache, trajectory writing) with an
ATE gate against ground truth — the driver-facing entry path itself
(rgbd_tum.cc:28-234 semantics)."""

import os

import numpy as np
import pytest
from PIL import Image

from gdslam_tpu.config import CameraConfig
from gdslam_tpu.io import synthetic
from gdslam_tpu.utils import metrics

pytestmark = pytest.mark.e2e

SCAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                    height=120, bf=160.0 * 0.08)
N_FRAMES = 16

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


@pytest.fixture(scope="module")
def tum_seq(tmp_path_factory):
    """TUM-layout sequence directory + associations + gt + mask cache."""
    root = tmp_path_factory.mktemp("tum_seq")
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    os.makedirs(root / "masks")
    assoc, gts = [], []
    for i in range(N_FRAMES):
        fr = synthetic.render_frame(i, SCAM, with_dynamic=True)
        ts = 1305031790.0 + i / 30.0   # realistic TUM epoch timestamps
        name = f"{ts:.6f}.png"
        Image.fromarray(np.asarray(fr.rgb).astype(np.uint8)).save(
            root / "rgb" / name)
        d16 = (np.asarray(fr.depth) * 5000.0).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(root / "depth" / name)
        # precomputed semantic masks (the PATH_TO_MASKS protocol): the GT
        # dynamic sphere, as the reference's Mask R-CNN cache would hold
        Image.fromarray((np.asarray(fr.dyn_mask) * 255).astype(np.uint8)).save(
            root / "masks" / f"{ts:.6f}.png")
        assoc.append(f"{ts:.6f} rgb/{name} {ts:.6f} depth/{name}")
        gts.append(np.asarray(fr.T_wc))
    with open(root / "assoc.txt", "w") as f:
        f.write("\n".join(assoc) + "\n")
    with open(root / "settings.yaml", "w") as f:
        f.write(SETTINGS_YAML)
    return str(root), gts


def _traj_ate(path, gts):
    rows = [l.split() for l in open(path).read().strip().splitlines()]
    assert all(len(r) == 8 for r in rows)
    T0 = gts[0]
    est, gtp = [], []
    for r in rows:
        ts = float(r[0])
        i = int(round((ts - 1305031790.0) * 30.0))
        est.append([float(x) for x in r[1:4]])
        gtp.append((np.linalg.inv(T0) @ gts[i])[:3, 3])
    return metrics.ate_rmse(np.asarray(est), np.asarray(gtp)), len(rows)


class TestRgbdTumCli:
    def test_plain_run_with_ate_gate(self, tum_seq, tmp_path, monkeypatch):
        from gdslam_tpu.cli import rgbd_tum
        seq_dir, gts = tum_seq
        monkeypatch.chdir(tmp_path)
        rc = rgbd_tum.main(["none", os.path.join(seq_dir, "settings.yaml"),
                            seq_dir, os.path.join(seq_dir, "assoc.txt")])
        assert rc == 0
        ate, n = _traj_ate("CameraTrajectory.txt", gts)
        assert n >= N_FRAMES - 3
        assert ate < 0.30   # unmasked run on a dynamic scene: loose gate
        kf_rows = open("KeyFrameTrajectory.txt").read().strip().splitlines()
        assert len(kf_rows) >= 1
        # keyframe timestamps must survive at full TUM epoch precision
        # (float32 would quantize 1305031790.x to 128 s steps)
        ts0 = float(kf_rows[0].split()[0])
        assert abs(ts0 - 1305031790.0) < 2.0

    def test_masked_run_beats_plain(self, tum_seq, tmp_path, monkeypatch):
        """Mask-cache mode (argc==6 semantics): precomputed semantic masks +
        the DynaSLAM geometry path must beat the unmasked ATE."""
        from gdslam_tpu.cli import rgbd_tum
        seq_dir, gts = tum_seq
        d = tmp_path / "masked"
        os.makedirs(d)
        monkeypatch.chdir(d)
        rc = rgbd_tum.main(["none", os.path.join(seq_dir, "settings.yaml"),
                            seq_dir, os.path.join(seq_dir, "assoc.txt"),
                            os.path.join(seq_dir, "masks")])
        assert rc == 0
        ate_masked, n = _traj_ate("CameraTrajectory.txt", gts)
        assert n >= N_FRAMES - 3
        assert ate_masked < 0.08


class TestEvaluateHarness:
    def test_evaluate_plain_and_gd(self, tum_seq, tmp_path, monkeypatch,
                                   capsys):
        """The evaluation harness (BASELINE configs 1-4 as one entry point):
        runs on a TUM-layout dir + groundtruth.txt unchanged, prints ATE/RPE
        and a machine-readable JSON line."""
        import json

        from gdslam_tpu.cli import evaluate
        from gdslam_tpu.system import trajectory as traj
        seq_dir, gts = tum_seq
        gt_path = os.path.join(seq_dir, "groundtruth.txt")
        traj.save_tum(gt_path, [(1305031790.0 + i / 30.0, gts[i])
                                for i in range(N_FRAMES)])
        monkeypatch.chdir(tmp_path)
        for mode, gate in (("plain", 0.30), ("gd", 0.15)):
            rc = evaluate.main([seq_dir, os.path.join(seq_dir, "assoc.txt"),
                                gt_path, "--mode", mode,
                                "--settings",
                                os.path.join(seq_dir, "settings.yaml"),
                                "--masks", os.path.join(seq_dir, "masks"),
                                "--rpe-delta", "5"])
            assert rc == 0
            out = capsys.readouterr().out.strip().splitlines()
            rec = json.loads(out[-1])
            assert rec["mode"] == mode
            assert rec["associated"] >= N_FRAMES - 4
            assert rec["ate_rmse_m"] < gate, (mode, rec)
            assert rec["rpe_rmse_m"] < 0.5

    def test_evaluate_mask_iou(self, tum_seq, tmp_path, monkeypatch, capsys):
        """--ref-masks reports mean dynamic-mask IoU; scoring the semantic
        prior against the ground-truth dynamic masks themselves must give a
        near-perfect IoU (sanity anchor for the metric)."""
        import json

        from gdslam_tpu.cli import evaluate
        from gdslam_tpu.system import trajectory as traj
        seq_dir, gts = tum_seq
        gt_path = os.path.join(seq_dir, "groundtruth.txt")
        if not os.path.exists(gt_path):
            traj.save_tum(gt_path, [(1305031790.0 + i / 30.0, gts[i])
                                    for i in range(N_FRAMES)])
        monkeypatch.chdir(tmp_path)
        rc = evaluate.main([seq_dir, os.path.join(seq_dir, "assoc.txt"),
                            gt_path, "--mode", "gd",
                            "--settings",
                            os.path.join(seq_dir, "settings.yaml"),
                            "--masks", os.path.join(seq_dir, "masks"),
                            "--ref-masks", os.path.join(seq_dir, "masks"),
                            "--rpe-delta", "5"])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "mask_iou" in rec
        # refined = semantic prior grown/cut by scene flow; against the
        # prior itself IoU stays high but not exactly 1
        assert rec["mask_iou"] > 0.5, rec

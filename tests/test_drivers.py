"""CLI driver tests (stereo_kitti / mono_tum / mono_kitti semantics,
Examples/{Stereo,Monocular}/*.cc) on synthetic dataset layouts, plus the
ORBvoc.txt text-vocabulary loader (TemplatedVocabulary.h:1338)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from gdslam_tpu.backend import vocabulary as voc
from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.io import synthetic

pytestmark = pytest.mark.e2e

SCAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                    height=120, bf=160.0 * 0.08, fps=30.0)

SETTINGS_YAML = """%YAML:1.0
Camera.fx: 160.0
Camera.fy: 160.0
Camera.cx: 80.0
Camera.cy: 60.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
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
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


class TestOrbVocTextLoader:
    def _write_vocab(self, path):
        """Tiny k=2 L=2 vocabulary with distinctive leaf descriptors."""
        rng = np.random.default_rng(0)
        # level-1 centers: all-zeros vs all-255 bytes; leaves perturb them
        d = {
            1: np.zeros(32, np.uint8), 2: np.full(32, 255, np.uint8),
            3: np.zeros(32, np.uint8), 4: np.r_[np.full(4, 255, np.uint8),
                                                np.zeros(28, np.uint8)],
            5: np.full(32, 255, np.uint8),
            6: np.r_[np.zeros(4, np.uint8), np.full(28, 255, np.uint8)],
        }
        lines = ["2 2 0 0"]
        parents = {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2}
        leaves = {3, 4, 5, 6}
        for nid in range(1, 7):
            desc = " ".join(str(int(x)) for x in d[nid])
            lines.append(f"{parents[nid]} {1 if nid in leaves else 0} "
                         f"{desc} 0.5")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return d

    def test_loads_and_transforms(self, tmp_path):
        p = str(tmp_path / "ORBvoc.txt")
        d = self._write_vocab(p)
        v = voc.load_orbvoc_text(p)
        assert v.k == 2 and v.levels == 2
        assert v.centers.shape == (2 + 4, 32)
        assert v.n_leaves == 4
        # a descriptor equal to each leaf must land on that leaf's word
        leaf_desc = jnp.asarray(np.stack([d[3], d[4], d[5], d[6]]))
        words = np.asarray(voc.transform(leaf_desc, v.centers, v.k, v.levels))
        assert sorted(words.tolist()) == [0, 1, 2, 3]

    def test_incomplete_tree_inherits_parent(self, tmp_path):
        """A node with a single child still transforms consistently."""
        p = str(tmp_path / "voc_incomplete.txt")
        z = " ".join(["0"] * 32)
        o = " ".join(["255"] * 32)
        lines = ["2 2 0 0",
                 f"0 0 {z} 0.5",      # node1
                 f"0 0 {o} 0.5",      # node2
                 f"1 1 {z} 0.5",      # node3: ONLY child of node1
                 f"2 1 {o} 0.5",      # node4: only child of node2
                 ]
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        v = voc.load_orbvoc_text(p)
        desc = jnp.asarray(np.stack([np.zeros(32, np.uint8),
                                     np.full(32, 255, np.uint8)]))
        words = np.asarray(voc.transform(desc, v.centers, v.k, v.levels))
        assert words[0] != words[1]   # the two extremes separate


def _write_png(path, arr, mode="L"):
    Image.fromarray(arr.astype(np.uint8), mode=mode).save(path)


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    """KITTI-layout stereo sequence rendered from the synthetic scene."""
    import jax

    from gdslam_tpu.core import lie
    root = tmp_path_factory.mktemp("kitti_seq")
    os.makedirs(root / "image_0")
    os.makedirs(root / "image_1")
    b = SCAM.bf / SCAM.fx
    shift = np.eye(4)
    shift[0, 3] = b
    times = []
    for i in range(10):
        T = np.asarray(synthetic.gt_pose(i))
        left = synthetic.render(jnp.asarray(T), SCAM, False, 30.0, i)
        right = synthetic.render(jnp.asarray(T @ shift), SCAM, False, 30.0, i)
        _write_png(root / "image_0" / f"{i:06d}.png", np.asarray(left.gray))
        _write_png(root / "image_1" / f"{i:06d}.png", np.asarray(right.gray))
        times.append(i / 30.0)
    with open(root / "times.txt", "w") as f:
        f.write("\n".join(f"{t:.6f}" for t in times) + "\n")
    with open(root / "settings.yaml", "w") as f:
        f.write(SETTINGS_YAML)
    return str(root)


@pytest.fixture(scope="module")
def tum_mono_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tum_mono")
    os.makedirs(root / "rgb")
    rows = []
    for i in range(14):
        fr = synthetic.render_frame(i, SCAM, with_dynamic=False)
        name = f"rgb/{i / 30.0:.6f}.png"
        _write_png(root / name, np.asarray(fr.gray))
        rows.append(f"{i / 30.0:.6f} {name}")
    with open(root / "rgb.txt", "w") as f:
        f.write("# ts path\n" + "\n".join(rows) + "\n")
    with open(root / "settings.yaml", "w") as f:
        f.write(SETTINGS_YAML)
    return str(root)


class TestStereoKittiDriver:
    def test_end_to_end(self, kitti_dir, tmp_path, monkeypatch):
        from gdslam_tpu.cli import stereo_kitti
        monkeypatch.chdir(tmp_path)
        rc = stereo_kitti.main(["none", os.path.join(kitti_dir, "settings.yaml"),
                                kitti_dir])
        assert rc == 0
        lines = open("CameraTrajectory.txt").read().strip().splitlines()
        assert len(lines) >= 8
        assert len(lines[0].split()) == 12   # KITTI 3x4 rows


class TestMonoTumDriver:
    def test_end_to_end(self, tum_mono_dir, tmp_path, monkeypatch):
        from gdslam_tpu.cli import mono_tum
        monkeypatch.chdir(tmp_path)
        rc = mono_tum.main(["none", os.path.join(tum_mono_dir, "settings.yaml"),
                            tum_mono_dir])
        assert rc == 0
        lines = open("KeyFrameTrajectory.txt").read().strip().splitlines()
        assert len(lines) >= 2
        assert len(lines[0].split()) == 8    # TUM format

"""KITTI stereo driver — the counterpart of Examples/Stereo/stereo_kitti.cc.

Usage (positional, mirroring stereo_kitti.cc):

    python -m gdslam_tpu.cli.stereo_kitti VOCAB SETTINGS SEQUENCE_DIR

- VOCAB: vocabulary .npz / ORBvoc.txt ('default' = built-in, 'none' = off)
- SETTINGS: OpenCV-YAML camera/ORB settings (e.g. KITTI00-02.yaml)
- SEQUENCE_DIR: KITTI odometry sequence (image_0/, image_1/, times.txt)

Emits CameraTrajectory.txt in KITTI format (stereo_kitti.cc SaveTrajectoryKITTI
semantics) and prints median/mean tracking time.
"""

from __future__ import annotations

import sys
import time


def _load_vocab(arg: str):
    if arg in ("none", "-"):
        return None
    from gdslam_tpu.backend import vocabulary as voc
    if arg == "default":
        return voc.default_vocabulary()
    if arg.endswith(".txt"):
        return voc.load_orbvoc_text(arg)
    return voc.load(arg)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 3:
        print(__doc__)
        return 1
    vocab_arg, settings_path, seq_dir = argv[:3]

    from gdslam_tpu.config import SlamConfig
    from gdslam_tpu.io.kitti import KittiStereoSequence
    from gdslam_tpu.system.slam import Sensor, System

    cfg = SlamConfig.from_opencv_yaml(settings_path)
    seq = KittiStereoSequence(seq_dir)
    print(f"Loaded {len(seq)} stereo frames from {seq_dir}")
    slam = System(cfg, Sensor.STEREO, vocabulary=_load_vocab(vocab_arg))

    times = []
    for i in range(len(seq)):
        left, right, ts = seq[i]
        t0 = time.perf_counter()
        slam.track_stereo(left, right, ts)
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(f"frame {i}/{len(seq)} state={slam.tracking_state.name} "
                  f"kfs={slam.keyframe_count}")

    slam.shutdown()
    times_s = sorted(times)
    print(f"median tracking time: {times_s[len(times_s) // 2]:.4f}")
    print(f"mean tracking time: {sum(times) / len(times):.4f}")
    slam.save_trajectory_kitti("CameraTrajectory.txt")
    print("trajectory saved!")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

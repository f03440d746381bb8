"""TUM monocular driver — the counterpart of Examples/Monocular/mono_tum.cc.

Usage (positional, mirroring mono_tum.cc):

    python -m gdslam_tpu.cli.mono_tum VOCAB SETTINGS SEQUENCE_DIR

- VOCAB: vocabulary .npz / ORBvoc.txt ('default' = built-in, 'none' = off)
- SETTINGS: OpenCV-YAML camera/ORB settings (e.g. TUM1.yaml)
- SEQUENCE_DIR: TUM sequence directory containing rgb.txt + rgb/

Emits KeyFrameTrajectory.txt (mono_tum.cc saves keyframes only — mono scale
makes the full frame trajectory gauge-dependent) and prints median/mean
tracking time.
"""

from __future__ import annotations

import sys
import time


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 3:
        print(__doc__)
        return 1
    vocab_arg, settings_path, seq_dir = argv[:3]

    from gdslam_tpu.cli.stereo_kitti import _load_vocab
    from gdslam_tpu.config import SlamConfig
    from gdslam_tpu.io.kitti import TumMonoSequence
    from gdslam_tpu.system.slam import Sensor, System

    cfg = SlamConfig.from_opencv_yaml(settings_path)
    seq = TumMonoSequence(seq_dir)
    print(f"Loaded {len(seq)} mono frames from {seq_dir}")
    slam = System(cfg, Sensor.MONOCULAR, vocabulary=_load_vocab(vocab_arg))

    times = []
    for i in range(len(seq)):
        gray, ts = seq[i]
        t0 = time.perf_counter()
        slam.track_monocular(gray, ts)
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(f"frame {i}/{len(seq)} state={slam.tracking_state.name} "
                  f"kfs={slam.keyframe_count}")

    slam.shutdown()
    times_s = sorted(times)
    print(f"median tracking time: {times_s[len(times_s) // 2]:.4f}")
    print(f"mean tracking time: {sum(times) / len(times):.4f}")
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    print("trajectory saved!")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

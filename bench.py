"""Benchmark: end-to-end tracked frames/sec on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's implied real-time operating point is 30 fps camera
rate (BASELINE.md; reference rgbd_tum.cc:178-185 paces to camera rate) —
vs_baseline = fps / 30.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from gdslam_tpu.config import SlamConfig
    from gdslam_tpu.io import synthetic
    from gdslam_tpu.system.tracking import Tracking

    cfg = SlamConfig()
    cam = cfg.camera
    # Warmup must cover every compile path (incl. keyframe insertion + local
    # BA, which first trigger around frame 11).
    n_warm, n_frames = 16, 60

    frames = [synthetic.render_frame(i, cam, with_dynamic=False)
              for i in range(n_warm + n_frames)]
    ones = jnp.ones((cam.height, cam.width))
    tracker = Tracking(cfg, kmax=256, pmax=65536, pipeline=True)

    # Warm-up: triggers all compilations (init, motion model, local map, KF).
    for i in range(n_warm):
        tracker.process(frames[i].gray, frames[i].depth, ones, i / 30.0)

    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_frames):
        tracker.process(frames[i].gray, frames[i].depth, ones, i / 30.0)
    tracker.flush()
    jax.block_until_ready(tracker.last.T_cw)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    print(json.dumps({
        "metric": "tracked_frames_per_sec",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()

"""Diagnose mono scale drift: run the mono circuit from test_loop_e2e and
print the per-keyframe segment scale ratios (est/gt) over the run."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from gdslam_tpu.backend import vocabulary as voc
from gdslam_tpu.backend.loop_closing import LoopCloser
from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.io import synthetic
from gdslam_tpu.system.tracking import Tracking

SCAM = CameraConfig(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320,
                    height=240, bf=320.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=512, n_levels=4))
N_FRAMES = 120

tr = Tracking(SCFG, kmax=64, pmax=32768)
lc = LoopCloser(SCFG, voc.default_vocabulary(), 64)
lc.fix_scale = False
tr.loop_closer = lc
n_run = 170
for i in range(n_run):
    fr = synthetic.render(synthetic.gt_pose_loop_mono(i, N_FRAMES),
                          SCAM, False, 30.0, i)
    tr.process_mono(fr.gray, i / 30.0)
tr.flush()
print("state:", tr.state.name, "n_kf:", tr.n_kf_host)

arena = tr.arena
T0 = np.asarray(synthetic.gt_pose_loop_mono(0, N_FRAMES))
cs, gs = [], []
for k, ts in enumerate(tr.kf_timestamps):
    i = int(round(ts * 30.0))
    cs.append(np.linalg.inv(np.asarray(arena.kf_pose[k]))[:3, 3])
    gs.append((np.linalg.inv(T0) @ np.asarray(
        synthetic.gt_pose_loop_mono(i, N_FRAMES)))[:3, 3])
cs, gs = np.asarray(cs), np.asarray(gs)
de = np.linalg.norm(np.diff(cs, axis=0), axis=1)
dg = np.linalg.norm(np.diff(gs, axis=0), axis=1)
keep = dg > 1e-3
r = de[keep] / dg[keep]
n = tr.n_kf_host
k0 = n // 2
seg_is_new = (np.arange(1, n)[keep] > k0)
print("per-segment est/gt ratios:")
for i, (kk, rr) in enumerate(zip(np.arange(1, n)[keep], r)):
    print(f"  kf {kk:3d}  ratio {rr:.3f}")
zone_nat = np.mean(r[seg_is_new]) / np.mean(r[~seg_is_new])
print("zone_nat:", zone_nat)
print("mean old:", np.mean(r[~seg_is_new]), "mean new:", np.mean(r[seg_is_new]))

print("\nkf positions est vs gt (aligned by first):")
for k in range(n):
    print(f"  kf {k:3d} ts={tr.kf_timestamps[k]*30:6.1f} est={np.round(cs[k],3)} gt={np.round(gs[k],3)}")

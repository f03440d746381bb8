import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.io import synthetic
from gdslam_tpu.system.tracking import Tracking
from gdslam_tpu.core import lie

SCAM = CameraConfig(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320,
                    height=240, bf=320.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=512, n_levels=4))
N_FRAMES = 120
tr = Tracking(SCFG, kmax=64, pmax=32768)

def kf_scale(arena, k, fr):
    """median (est depth of observed pts in KF cam) / (gt depth at the keypoint)."""
    obs = np.asarray(arena.kf_obs[k]); ok = obs >= 0
    if ok.sum() < 10: return np.nan, 0
    pts = np.asarray(arena.pt_pos)[obs[ok]]
    T = np.asarray(arena.kf_pose[k])
    z_est = (T[:3, :3] @ pts.T + T[:3, 3:4])[2]
    uv = np.asarray(arena.kf_uv[k])[ok]
    d = np.asarray(fr.depth)
    gt_z = d[np.clip(uv[:, 1].astype(int), 0, SCAM.height - 1),
             np.clip(uv[:, 0].astype(int), 0, SCAM.width - 1)]
    m = gt_z > 0
    return float(np.median(z_est[m] / gt_z[m])), int(ok.sum())

frames = {}
nkf_prev = 0
for i in range(100):
    fr = synthetic.render(synthetic.gt_pose_loop_mono(i, N_FRAMES), SCAM, False, 30.0, i)
    tr.process_mono(fr.gray, i / 30.0)
    if tr.n_kf_host != nkf_prev:
        k = tr.n_kf_host - 1
        frames[k] = fr
        s, n = kf_scale(tr.arena, k, fr)
        print(f"KF {k:2d} @f{i:3d}: live scale={s:.3f} nobs={n}")
        nkf_prev = tr.n_kf_host
print("\nfinal arena scales:")
for k, fr in frames.items():
    s, n = kf_scale(tr.arena, k, fr)
    print(f"KF {k:2d}: final scale={s:.3f} nobs={n}")

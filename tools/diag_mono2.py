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
T0g = np.asarray(synthetic.gt_pose_loop_mono(0, N_FRAMES))
nkf_prev = 0
for i in range(170):
    fr = synthetic.render(synthetic.gt_pose_loop_mono(i, N_FRAMES), SCAM, False, 30.0, i)
    T = tr.process_mono(fr.gray, i / 30.0)
    nkf = tr.n_kf_host
    kfmark = " KF" if nkf != nkf_prev else ""
    nkf_prev = nkf
    if i >= 40 and i <= 140:
        pos = np.linalg.inv(np.asarray(T))[:3, 3] if np.asarray(T).shape == (4,4) else None
        npts = int(np.asarray(tr.arena.n_pt))
        print(f"f{i:3d} st={tr.state.name:4s} inl={tr.n_inliers:4d} nkf={nkf:2d} npt={npts:5d} pos={np.round(pos,2) if pos is not None else '?'}{kfmark}")
tr.flush()

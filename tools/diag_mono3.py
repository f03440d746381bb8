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

SCAM = CameraConfig(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320,
                    height=240, bf=320.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=512, n_levels=4))
N_FRAMES = 120
use_ba = sys.argv[1] == "ba" if len(sys.argv) > 1 else True
tr = Tracking(SCFG, kmax=64, pmax=32768)
tr.use_local_ba = use_ba
print("use_local_ba:", tr.use_local_ba)
for i in range(100):
    fr = synthetic.render(synthetic.gt_pose_loop_mono(i, N_FRAMES), SCAM, False, 30.0, i)
    T = tr.process_mono(fr.gray, i / 30.0)
    if i % 4 == 0 and i >= 12:
        pos = np.linalg.inv(np.asarray(T))[:3, 3]
        gt = np.asarray(synthetic.gt_pose_loop_mono(i, N_FRAMES))[:3, 3]
        print(f"f{i:3d} st={tr.state.name:4s} inl={tr.n_inliers:4d} nkf={tr.n_kf_host:2d} pos={np.round(pos,2)} gt3={np.round(gt*3,2)}")

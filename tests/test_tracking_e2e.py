import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.io import synthetic
from gdslam_tpu.system.tracking import Tracking
from gdslam_tpu.utils import metrics

pytestmark = pytest.mark.e2e

SCAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160, height=120,
                    bf=160.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=384, n_levels=4))
N_FRAMES = 14


@pytest.fixture(scope="module")
def seq():
    return [synthetic.render_frame(i, SCAM, with_dynamic=False)
            for i in range(N_FRAMES)]


def run_tracking(seq, pipeline: bool):
    tr = Tracking(SCFG, kmax=32, pmax=16384, pipeline=pipeline)
    ones = jnp.ones((120, 160))
    for i, fr in enumerate(seq):
        tr.process(fr.gray, fr.depth, ones, i / 30.0)
    tr.flush()
    traj = tr.camera_trajectory()
    T0 = np.asarray(seq[0].T_wc)
    est = np.array([T[:3, 3] for _, T in traj])
    gtp = np.array([(np.linalg.inv(T0) @ np.asarray(seq[i].T_wc))[:3, 3]
                    for i in range(len(est))])
    return tr, metrics.ate_rmse(est, gtp), len(traj)


class TestRgbdEndToEnd:
    def test_sync_mode(self, seq):
        tr, ate, n = run_tracking(seq, pipeline=False)
        assert tr.state.name == "OK"
        assert n >= N_FRAMES - 2
        assert ate < 0.06          # tiny-rig bound; catches structural breaks

    def test_pipelined_mode_matches(self, seq):
        tr, ate, n = run_tracking(seq, pipeline=True)
        assert tr.state.name == "OK"
        assert n >= N_FRAMES - 2
        assert ate < 0.06

    def test_localization_mode_freezes_map(self, seq):
        tr = Tracking(SCFG, kmax=32, pmax=16384)
        ones = jnp.ones((120, 160))
        for i, fr in enumerate(seq[:6]):
            tr.process(fr.gray, fr.depth, ones, i / 30.0)
        tr.mapping_enabled = False
        n_kf = int(tr.arena.n_kf)
        for i, fr in enumerate(seq[6:]):
            tr.process(fr.gray, fr.depth, ones, (6 + i) / 30.0)
        assert int(tr.arena.n_kf) == n_kf
        assert tr.state.name == "OK"

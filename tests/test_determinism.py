"""Deterministic evaluation: two identical tracking runs in the same
process must produce BITWISE-identical trajectories.

VERDICT r1 flagged a 2-6 cm ATE band "under recompilation"; within one
compiled program the system must at least be exactly reproducible — any
in-process nondeterminism (unordered scatter-adds, RNG leakage through host
state) would silently break evaluation comparisons. Cross-compilation
variance is bounded separately by the ATE gates in test_cli_e2e.
"""

import jax.numpy as jnp
import numpy as np

from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.io import synthetic
from gdslam_tpu.system.tracking import Tracking
import pytest

pytestmark = pytest.mark.e2e

SCAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                    height=120, bf=160.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=384, n_levels=4))
N = 24


def _run(pipeline: bool):
    tr = Tracking(SCFG, kmax=32, pmax=16384, pipeline=pipeline)
    ones = jnp.ones((SCAM.height, SCAM.width))
    for i in range(N):
        fr = synthetic.render_frame(i, SCAM, with_dynamic=True)
        tr.process(fr.gray, fr.depth, ones, i / 30.0)
    tr.flush()
    return np.asarray([np.asarray(T) for _, T in tr.camera_trajectory()])


class TestDeterministicEval:
    def test_sync_runs_bitwise_identical(self):
        a = _run(pipeline=False)
        b = _run(pipeline=False)
        np.testing.assert_array_equal(a, b)

    def test_pipelined_runs_bitwise_identical(self):
        a = _run(pipeline=True)
        b = _run(pipeline=True)
        np.testing.assert_array_equal(a, b)

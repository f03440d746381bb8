"""End-to-end test of the DynaSLAM geometry tracking path (entry point B).

Reference: GrabImageRGBD (Tracking.cc:271-369) — LightTrack pose pre-pass ->
Geometry::GeometricModelCorrection -> Frame rebuilt with refined mask ->
Track -> InpaintFrames -> GeometricModelUpdateDB. Here the whole chain runs
inside System.track_rgbd(use_geometry=True) / track_rgbd_geom, with NO
GeoMaskMaker and NO semantic net: the moving object must be suppressed by
the multi-view geometric masking alone.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.io import synthetic
from gdslam_tpu.system.slam import Sensor, System
from gdslam_tpu.utils import metrics

pytestmark = pytest.mark.e2e

SCAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                    height=120, bf=160.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=384, n_levels=4))
N_FRAMES = 24


@pytest.fixture(scope="module")
def dyn_seq():
    return [synthetic.render_frame(i, SCAM, with_dynamic=True)
            for i in range(N_FRAMES)]


def _run(dyn_seq, use_geometry: bool):
    slam = System(SCFG, Sensor.RGBD, kmax=32, pmax=16384)
    for i, fr in enumerate(dyn_seq):
        slam.track_rgbd(np.asarray(fr.rgb), np.asarray(fr.depth), None,
                        i / 30.0, use_geometry=use_geometry)
    slam.shutdown()
    traj = slam.tracker.camera_trajectory()
    T0 = np.asarray(dyn_seq[0].T_wc)
    est = np.array([T[:3, 3] for _, T in traj])
    gtp = np.array([(np.linalg.inv(T0) @ np.asarray(dyn_seq[int(round(
        ts * 30.0))].T_wc))[:3, 3] for ts, _ in traj])
    return slam, metrics.ate_rmse(est, gtp)


class TestGeometryTrackingPath:
    def test_geometry_path_beats_unmasked(self, dyn_seq):
        """A moving object must be suppressed by the geometry path (no GD,
        no semantic net) and improve ATE over the unmasked run."""
        slam_g, ate_geo = _run(dyn_seq, use_geometry=True)
        _, ate_plain = _run(dyn_seq, use_geometry=False)
        assert slam_g.tracker.state.name == "OK"
        # the geometry DB must have been populated from keyframes
        assert bool(jnp.any(slam_g._geometry.db.valid))
        assert ate_geo < ate_plain
        # the refined mask must actually flag part of the dynamic sphere
        dyn = np.asarray(dyn_seq[-1].dyn_mask)
        refined = np.asarray(slam_g._last_refined_mask)
        flagged = (refined < 0.5) & dyn
        assert flagged.sum() > 0.1 * dyn.sum()

    def test_track_rgbd_geom_outputs(self, dyn_seq):
        """7-arg TrackRGBD form: inpainted rgb/depth + refined mask out."""
        slam = System(SCFG, Sensor.RGBD, kmax=32, pmax=16384)
        for i, fr in enumerate(dyn_seq[:10]):
            out = slam.track_rgbd_geom(np.asarray(fr.rgb),
                                       np.asarray(fr.depth), None, i / 30.0)
        T, rgb_o, depth_o, mask_o = out
        assert rgb_o.shape == (120, 160, 3)
        assert depth_o.shape == (120, 160)
        assert mask_o.shape == (120, 160)
        # inpainting may only ADD depth where the mask removed it
        fr = dyn_seq[9]
        hole = (mask_o < 0.5)
        if hole.any():
            filled = (np.asarray(fr.depth)[hole] == 0) | \
                (depth_o[hole] > 0)
            assert filled.mean() > 0.5

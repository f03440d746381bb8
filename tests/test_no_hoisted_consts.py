"""Regression guard for the jax-0.9 C++ jit fastpath replay bug.

Eagerly-created jnp constants captured during tracing (e.g. an intrinsics
matrix built with `jnp.asarray` inside a nested-jitted helper) are hoisted
into hidden executable parameters. The Python dispatch path passes them, but
the C++ fastpath taken on cache-hit replay does NOT — the second execution of
the same compiled program dies with "Execution supplied N buffers but
compiled program expected N+k buffers". The fix is to keep such constants
host-side (numpy), so they are baked into the HLO as literals.

These tests assert the invariant directly: the hot, repeatedly-replayed
programs must close over ZERO jaxpr consts.
"""

import jax
import jax.numpy as jnp
import pytest

from gdslam_tpu.backend import map_arena as ma
from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.frontend.frame import Frame
from gdslam_tpu.system import tracking as trk

CAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                   height=120, bf=160.0 * 0.08)
CFG = SlamConfig(camera=CAM,
                 orb=OrbConfig(n_features=384, scale_factor=1.2, n_levels=4))


def _dummy_frame(n=384):
    return Frame(uv=jnp.zeros((n, 2)), uv_raw=jnp.zeros((n, 2)),
                 ur=-jnp.ones(n), depth=jnp.zeros(n),
                 level=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
                 response=jnp.zeros(n), desc=jnp.zeros((n, 32), jnp.uint8),
                 valid=jnp.zeros(n, bool))


def _assert_no_consts(traced, label):
    consts = traced.jaxpr.consts
    assert consts == [], (
        f"{label} closes over {len(consts)} jaxpr const(s) "
        f"{[(getattr(c, 'dtype', None), getattr(c, 'shape', None)) for c in consts]} — "
        "these become hidden executable parameters that the C++ jit fastpath "
        "drops on replay. Build the constant with numpy (host) instead of jnp.")


@pytest.mark.parametrize("use_tri,use_ba", [(True, True), (True, False),
                                            (False, True)])
def test_keyframe_program_has_no_hoisted_consts(use_tri, use_ba):
    arena = ma.new_arena(512, 65536, 384)
    frame = _dummy_frame()
    traced = trk.keyframe_program.trace(
        arena, frame, jnp.eye(4), -jnp.ones(384, jnp.int32),
        jnp.asarray(1305031790.5), CFG, use_tri, use_ba)
    _assert_no_consts(traced, f"keyframe_program(tri={use_tri}, ba={use_ba})")


def test_track_step_has_no_hoisted_consts():
    arena = ma.new_arena(512, 65536, 384)
    frame = _dummy_frame()
    last = trk.FrameState(frame=frame, T_cw=jnp.eye(4),
                          assoc=-jnp.ones(384, jnp.int32))
    gray = jnp.zeros((CAM.height, CAM.width))
    traced = trk.track_step.trace(
        arena, last, jnp.eye(4), jnp.asarray(True), gray,
        jnp.zeros_like(gray), jnp.ones_like(gray), CFG,
        jnp.asarray(0, jnp.int32))
    _assert_no_consts(traced, "track_step")


@pytest.mark.e2e   # minute-scale compile; full run covers it
def test_keyframe_program_replays(monkeypatch):
    """Drive the sync RGB-D tracker long enough that keyframe_program's
    compiled executable is REPLAYED (3+ keyframes with the same static
    config) — the exact scenario that crashed before the fix."""
    import numpy as np

    from gdslam_tpu.io import synthetic
    from gdslam_tpu.system.slam import System
    slam = System(CFG)
    for i in range(16):
        fr = synthetic.render_frame(i, CAM, with_dynamic=True)
        slam.track_rgbd(np.asarray(fr.rgb), np.asarray(fr.depth), None,
                        1305031790.0 + i / 30.0)
    # >= 4 keyframes means the use_ba=True executable ran at least twice
    # (first run compiles, later runs take the C++ fastpath replay).
    assert slam.keyframe_count >= 4

"""Multi-sequence data-parallel evaluation over a device mesh.

The reference has no distributed layer (SURVEY §2.3: one process, 3-4 POSIX
threads); scale-out here is the batched multi-sequence configuration
(BASELINE config 5): one TUM-style sequence per mesh slot, the whole
per-frame tracking step sharded with `shard_map` over a 1-D `seq` axis, and
`jax.lax` collectives only for metric reduction — so the single-sequence
program compiles collective-free while the batched program rides ICI.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdslam_tpu.backend import optimizer
from gdslam_tpu.config import SlamConfig
from gdslam_tpu.core import camera as cam_ops
from gdslam_tpu.core import lie
from gdslam_tpu.frontend import extractor, matcher
from gdslam_tpu.frontend.frame import build_frame
from gdslam_tpu.ops import orb as orb_ops


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(jnp.array(devs).reshape(-1) if False else devs, (axis,))


class TrackStepState(NamedTuple):
    """Per-sequence device state threaded through the batched tracker."""

    T_cw: jnp.ndarray       # [4, 4]
    prev_gray: jnp.ndarray  # [H, W]
    prev_depth: jnp.ndarray  # [H, W]


def single_track_step(state: TrackStepState, gray: jnp.ndarray,
                      depth: jnp.ndarray, cfg: SlamConfig,
                      height: int, width: int):
    """One frame of visual odometry (extract + match-to-prev + pose GN) —
    the per-sequence unit that the mesh parallelizes."""
    cam = cfg.camera
    K = (cam.fx, cam.fy, cam.cx, cam.cy)
    ones = jnp.ones((height, width))
    prev_feats = extractor.extract(state.prev_gray, cfg.orb, height, width)
    prev_frame = build_frame(prev_feats, state.prev_depth, ones, cam)
    feats = extractor.extract(gray, cfg.orb, height, width)
    frame = build_frame(feats, depth, ones, cam)

    # previous-frame keypoints -> world points through the current pose chain
    pc = cam_ops.backproject(prev_frame.uv, prev_frame.depth, cam)
    pw = lie.se3_apply(lie.se3_inverse(state.T_cw), pc)
    cand_valid = prev_frame.valid & (prev_frame.depth > 0)
    uv_proj, _ = cam_ops.project(lie.se3_apply(state.T_cw, pw), cam)
    sf = float(cfg.orb.scale_factor)
    radius = 15.0 * sf ** prev_frame.level.astype(jnp.float32)
    res = matcher.match_candidates(
        uv_proj, cand_valid,
        orb_ops.descriptors_pm1(prev_frame.desc, cand_valid),
        prev_frame.level, prev_frame.angle, radius,
        frame.uv, frame.valid,
        orb_ops.descriptors_pm1(frame.desc, frame.valid),
        frame.level, frame.angle)
    matched = res.point_idx >= 0
    rows = jnp.where(matched, res.point_idx, 0)
    obs = optimizer.PoseObs(
        pw=jnp.where(matched[:, None], pw[rows], 0.0),
        uv=frame.uv, ur=frame.ur,
        inv_sigma2=1.0 / sf ** (2.0 * frame.level.astype(jnp.float32)),
        valid=matched)
    T, inl, n_inl = optimizer.pose_optimization(state.T_cw, obs, K, cam.bf,
                                                rounds=2, iters=6)
    new_state = TrackStepState(T_cw=T, prev_gray=gray, prev_depth=depth)
    return new_state, n_inl


def batched_track_step(cfg: SlamConfig, height: int, width: int,
                       mesh: Mesh, axis: str = "seq"):
    """Build the sharded batched step: [B, ...] arrays sharded over `axis`.

    Returns a jitted fn (states, grays, depths) -> (states, mean_inliers)
    where the mean is a cross-device `psum` — the only collective, as per the
    design (SURVEY §5 'distributed communication backend')."""

    def step(states, grays, depths):
        def one(state, gray, depth):
            return single_track_step(state, gray, depth, cfg, height, width)
        new_states, inls = jax.vmap(one)(states, grays, depths)
        total = jax.lax.psum(jnp.sum(inls), axis)
        count = jax.lax.psum(inls.shape[0], axis)
        return new_states, total / count

    spec = P(axis)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(TrackStepState(spec, spec, spec), spec, spec),
        out_specs=(TrackStepState(spec, spec, spec), P()))
    return jax.jit(sharded)


def init_states(batch: int, height: int, width: int) -> TrackStepState:
    return TrackStepState(
        T_cw=jnp.tile(jnp.eye(4), (batch, 1, 1)),
        prev_gray=jnp.zeros((batch, height, width)),
        prev_depth=jnp.zeros((batch, height, width)),
    )

"""Multi-chip (virtual 8-device CPU mesh) tests for the batched full tracker.

Validates what the driver's dryrun validates — shard_map sharding of the
complete tracking system over a `seq` mesh axis — plus numerical parity:
every mesh slot must produce the same trajectory as an independent
single-device run of the identical per-sequence program (data parallelism
must not change results). SURVEY §2.3 / §4; BASELINE config 5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.io import synthetic
from gdslam_tpu.parallel import batch_eval

pytestmark = pytest.mark.e2e

CAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                   height=120, fps=30.0, bf=6.4, th_depth=40.0)
CFG = SlamConfig(camera=CAM, orb=OrbConfig(n_features=256, n_levels=4))
H, W = CAM.height, CAM.width
N_SEQ = 8
N_FRAMES = 6
KMAX, PMAX = 16, 4096


@pytest.fixture(scope="module")
def sequences():
    """[B, T, H, W] grays/depths: sequence b starts at gt frame 3*b, so every
    slot tracks a different segment of the trajectory."""
    grays, depths = [], []
    for b in range(N_SEQ):
        gs, ds = [], []
        for t in range(N_FRAMES):
            f = synthetic.render_frame(3 * b + t, CAM, with_dynamic=False)
            gs.append(f.gray)
            ds.append(f.depth)
        grays.append(jnp.stack(gs))
        depths.append(jnp.stack(ds))
    return jnp.stack(grays), jnp.stack(depths)


@pytest.fixture(scope="module")
def batched_run(sequences):
    grays, depths = sequences
    assert jax.device_count() >= N_SEQ, "conftest must force 8 CPU devices"
    mesh = batch_eval.make_mesh(N_SEQ)
    step = batch_eval.batched_track_step(CFG, H, W, mesh, kmax=KMAX,
                                         pmax=PMAX)
    states = batch_eval.init_states(N_SEQ, CFG, kmax=KMAX, pmax=PMAX)
    mean_inls = []
    for t in range(N_FRAMES):
        states, mean_inl = step(states, grays[:, t], depths[:, t])
        mean_inls.append(float(mean_inl))
    return states, mean_inls


def test_batched_tracker_initializes_and_tracks(batched_run):
    states, mean_inls = batched_run
    assert bool(jnp.all(states.initialized))
    assert not bool(jnp.any(states.lost))
    # every slot inserted at least the bootstrap keyframe + grew points
    assert int(jnp.min(states.arena.n_kf)) >= 1
    assert int(jnp.min(states.arena.n_pt)) > 50
    # the psum-reduced metric is a positive replicated scalar once tracking
    assert mean_inls[-1] > 20


def test_batched_matches_independent_runs(sequences, batched_run):
    """Per-slot results must equal N independent single-device runs."""
    grays, depths = sequences
    states_b, _ = batched_run

    ones = jnp.ones((H, W))
    step1 = jax.jit(lambda s, g, d: batch_eval.device_track_step(
        s, g, d, ones, CFG))

    for b in range(N_SEQ):
        st = batch_eval.init_seq_state(CFG, kmax=KMAX, pmax=PMAX)
        for t in range(N_FRAMES):
            st, _ = step1(st, grays[b, t], depths[b, t])
        T_batched = np.asarray(jax.tree.map(lambda x: x[b],
                                            states_b.last_T_cw))
        T_solo = np.asarray(st.last_T_cw)
        np.testing.assert_allclose(T_batched, T_solo, atol=5e-3,
                                   err_msg=f"slot {b} pose diverged")
        assert int(states_b.arena.n_kf[b]) == int(st.arena.n_kf)
        assert int(states_b.arena.n_pt[b]) == int(st.arena.n_pt)


def test_lost_slot_relocalizes_others_unaffected():
    """Force a mid-sequence loss in ONE slot (blackout frames) and assert it
    re-localizes via the on-device relocalization path (Tracking.cc:439-447:
    LOST -> Relocalization only) while every other slot's state is
    bit-identical to an unperturbed run — per-slot independence of the
    data-parallel layer."""
    n_frames = 8
    blackout = (3, 4)  # slot 0 sees zeros at these frames -> tracking lost
    grays, depths = [], []
    for b in range(N_SEQ):
        gs, ds = [], []
        for t in range(n_frames):
            f = synthetic.render_frame(2 * b + t, CAM, with_dynamic=False)
            gs.append(f.gray)
            ds.append(f.depth)
        grays.append(jnp.stack(gs))
        depths.append(jnp.stack(ds))
    grays, depths = jnp.stack(grays), jnp.stack(depths)
    grays_p = grays.at[0, blackout[0]:blackout[1] + 1].set(0.0)
    depths_p = depths.at[0, blackout[0]:blackout[1] + 1].set(0.0)

    mesh = batch_eval.make_mesh(N_SEQ)
    step = batch_eval.batched_track_step(CFG, H, W, mesh, kmax=KMAX,
                                         pmax=PMAX)

    def run(gs, ds):
        states = batch_eval.init_states(N_SEQ, CFG, kmax=KMAX, pmax=PMAX)
        lost_trace = []
        for t in range(n_frames):
            states, _ = step(states, gs[:, t], ds[:, t])
            lost_trace.append(np.asarray(states.lost))
        return states, np.stack(lost_trace)  # [T, B]

    clean, _ = run(grays, depths)
    pert, lost = run(grays_p, depths_p)

    # slot 0 was lost during the blackout and recovered afterwards
    assert lost[blackout[1], 0], "blackout must cause tracking loss"
    assert not lost[-1, 0], "slot 0 must relocalize after the blackout"
    # relocalized pose is consistent with the unperturbed trajectory
    T_reloc = np.asarray(pert.last_T_cw[0])
    T_clean = np.asarray(clean.last_T_cw[0])
    assert np.linalg.norm(T_reloc[:3, 3] - T_clean[:3, 3]) < 0.1
    # every OTHER slot is bit-identical to the unperturbed run
    for b in range(1, N_SEQ):
        np.testing.assert_array_equal(np.asarray(pert.last_T_cw[b]),
                                      np.asarray(clean.last_T_cw[b]))
        assert int(pert.arena.n_kf[b]) == int(clean.arena.n_kf[b])
        assert int(pert.arena.n_pt[b]) == int(clean.arena.n_pt[b])


def test_batched_gd_dynamic_sequences():
    """BASELINE config 5 on DYNAMIC sequences: every mesh slot runs the
    FULL GD tracker (per-slot 5-frame ring + gd_step_core scene-flow
    masking) under shard_map, and each slot's result equals an independent
    single-device run of the identical per-sequence GD program."""
    n_frames = 9
    grays, depths = [], []
    for b in range(N_SEQ):
        gs, ds = [], []
        for t in range(n_frames):
            f = synthetic.render_frame(2 * b + t, CAM, with_dynamic=True)
            gs.append(f.gray)
            ds.append(f.depth)
        grays.append(jnp.stack(gs))
        depths.append(jnp.stack(ds))
    grays, depths = jnp.stack(grays), jnp.stack(depths)

    mesh = batch_eval.make_mesh(N_SEQ)
    from jax.sharding import PartitionSpec as P
    ones = jnp.ones((H, W))

    def step(states, gs, ds):
        state1 = jax.tree.map(lambda x: x[0], states)
        new1, stats = batch_eval.device_track_step(state1, gs[0], ds[0],
                                                   ones, CFG)
        return jax.tree.map(lambda x: x[None], new1), stats[1][None]

    spec = P("seq")
    sharded = jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, spec), check_vma=False))

    states = batch_eval.init_states(N_SEQ, CFG, kmax=KMAX, pmax=PMAX,
                                    use_gd=True)
    for t in range(n_frames):
        states, _ = sharded(states, grays[:, t], depths[:, t])

    assert bool(jnp.all(states.initialized))
    assert not bool(jnp.any(states.lost))
    # the GD ring advanced past warm-up in every slot
    assert int(jnp.min(states.gd.count)) == n_frames

    # per-slot parity with independent single-device GD runs
    step1 = jax.jit(lambda s, g, d: batch_eval.device_track_step(
        s, g, d, ones, CFG))
    for b in range(0, N_SEQ, 3):
        st = batch_eval.init_seq_state(CFG, kmax=KMAX, pmax=PMAX,
                                       use_gd=True)
        for t in range(n_frames):
            st, _ = step1(st, grays[b, t], depths[b, t])
        np.testing.assert_allclose(
            np.asarray(states.last_T_cw[b]), np.asarray(st.last_T_cw),
            atol=5e-3, err_msg=f"slot {b} GD pose diverged")
        assert int(states.arena.n_kf[b]) == int(st.arena.n_kf)


def test_single_sequence_program_is_collective_free():
    """The per-sequence step must compile without collectives (SURVEY §5:
    the distributed layer adds psum only in the batched wrapper)."""
    ones = jnp.ones((H, W))
    st = batch_eval.init_seq_state(CFG, kmax=KMAX, pmax=PMAX)
    lowered = jax.jit(lambda s, g, d: batch_eval.device_track_step(
        s, g, d, ones, CFG)).lower(st, ones, ones)
    hlo = lowered.as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute"):
        assert coll not in hlo

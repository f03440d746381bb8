"""Keyframe-arena compaction: culled slots are recycled (the counterpart of
the reference freeing bad keyframes, KeyFrame::SetBadFlag KeyFrame.cc:
533-580) and every host-side slot reference is remapped."""

import jax.numpy as jnp
import numpy as np

from gdslam_tpu.backend import map_arena as ma
from gdslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from gdslam_tpu.core import lie
from gdslam_tpu.system.tracking import Tracking

CAM = CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                   height=120, fps=30.0, bf=12.8, th_depth=40.0)
CFG = SlamConfig(camera=CAM, orb=OrbConfig(n_features=64, n_levels=2))
KMAX = 8


def _fabricated_tracker(culled=(2, 4)):
    """A Tracking at keyframe saturation with `culled` slots invalid."""
    tr = Tracking(CFG, kmax=KMAX, pmax=256)
    n_kf = KMAX - 1
    arena = tr.arena
    poses = jnp.stack([lie.se3_exp(jnp.asarray(
        [0.1 * i, 0.0, 0.0, 0.0, 0.0, 0.02 * i])) for i in range(KMAX)])
    valid = np.ones(KMAX, bool)
    valid[n_kf:] = False
    for c in culled:
        valid[c] = False
    covis = np.zeros((KMAX, KMAX), np.int32)
    for i in range(n_kf):
        for j in range(n_kf):
            if i != j and valid[i] and valid[j]:
                covis[i, j] = 100 - 10 * abs(i - j)
    parent = np.array([-1] + [i - 1 for i in range(1, KMAX)], np.int32)
    n_pt = 10
    pt_valid = np.zeros(256, bool)
    pt_valid[:n_pt] = True
    pt_ref = np.zeros(256, np.int32)
    pt_ref[:n_pt] = [0, 1, 2, 3, 4, 5, 6, 0, 2, 4]  # some refs culled
    arena = arena._replace(
        kf_pose=poses, kf_valid=jnp.asarray(valid),
        kf_time=jnp.arange(KMAX, dtype=jnp.float32),
        covis=jnp.asarray(covis), kf_parent=jnp.asarray(parent),
        pt_valid=jnp.asarray(pt_valid), pt_ref_kf=jnp.asarray(pt_ref),
        n_kf=jnp.asarray(n_kf, jnp.int32),
        n_pt=jnp.asarray(n_pt, jnp.int32))
    tr.arena = arena
    tr.kf_timestamps = [float(i) for i in range(n_kf)]
    tr.records = [(float(i), i, np.eye(4), False) for i in range(n_kf)]
    tr.ref_kf = n_kf - 1
    return tr


def test_compaction_recycles_and_remaps():
    tr = _fabricated_tracker(culled=(2, 4))
    tr.compact_min_gain = 1
    tr._compact_requested = True
    old_poses = np.asarray(tr.arena.kf_pose)
    tr._maybe_compact()
    arena = tr.arena
    keep = [0, 1, 3, 5, 6]
    assert int(arena.n_kf) == len(keep)
    assert tr.n_kf_host == len(keep)
    v = np.asarray(arena.kf_valid)
    assert v[:len(keep)].all() and not v[len(keep):].any()
    # surviving poses moved to the front in original order
    for new, old in enumerate(keep):
        np.testing.assert_allclose(np.asarray(arena.kf_pose[new]),
                                   old_poses[old], atol=1e-6)
        assert tr.kf_timestamps[new] == float(old)
    # pt_ref_kf: culled refs remap to the nearest surviving predecessor
    # old refs [0,1,2,3,4,5,6] -> new [0,1,1,2,2,3,4]
    ref = np.asarray(arena.pt_ref_kf[:7])
    np.testing.assert_array_equal(ref, [0, 1, 1, 2, 2, 3, 4])
    # covisibility submatrix preserved under the permutation
    cov = np.asarray(arena.covis)
    for a, oa in enumerate(keep):
        for b, ob in enumerate(keep):
            expected = 0 if oa == ob else 100 - 10 * abs(oa - ob)
            assert cov[a, b] == expected
    assert not cov[len(keep):, :].any() and not cov[:, len(keep):].any()
    # parents: old chain 0<-1<-2... with 2,4 culled -> new parents follow
    # nearest-survivor; keyframe at new slot 2 (old 3) had parent old 2 ->
    # survivor old 1 -> new 1
    par = np.asarray(arena.kf_parent)
    assert par[0] == -1
    assert par[1] == 0
    assert par[2] == 1   # old 3's parent old-2 -> survivor old-1 -> new 1
    assert par[3] == 2   # old 5's parent old-4 -> survivor old-3 -> new 2
    assert par[4] == 3   # old 6's parent old-5 -> new 3
    # host references remapped
    assert tr.ref_kf == len(keep) - 1
    assert tr.records[3][1] == 2   # old ref 3 -> new 2
    # trackers regain keyframe headroom: the saturation gate reopens
    assert tr.n_kf_host < tr.arena.kmax - 1


def test_compaction_warns_when_nothing_to_free(recwarn):
    tr = _fabricated_tracker(culled=())
    tr.compact_min_gain = 1
    tr._compact_requested = True
    tr._maybe_compact()
    assert tr.n_kf_host == KMAX - 1    # nothing changed
    assert tr.kf_arena_full_warned


def test_local_keyframes_tiny_arena():
    """kmax smaller than the local-window cap must not crash (regression:
    lax.top_k(k=16) on a [12]-slot arena raised; hit by any small-arena
    tracker once BA's build_problem asks for its 16-KF window)."""
    tr = Tracking(CFG, kmax=4, pmax=256)
    ids, valid = ma.local_keyframes(tr.arena, jnp.asarray(0), cap=16)
    assert ids.shape == (16,) and valid.shape == (16,)
    assert int(ids.max()) < 4          # clamped into the arena
    assert not bool(valid.any())       # empty arena -> nothing valid

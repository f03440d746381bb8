"""Snapshot-based mono Sim3 diag: run tracking ONCE, pickle the arena +
metadata, then iterate on the injection+correction step instantly.

Usage: python tools/diag_mono5.py [--rebuild]
"""
import os, sys, pickle, time
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
from gdslam_tpu.backend import vocabulary as voc

SCAM = CameraConfig(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320,
                    height=240, bf=320.0 * 0.08)
SCFG = SlamConfig(camera=SCAM, orb=OrbConfig(n_features=512, n_levels=4))
N_FRAMES = 120
SNAP = "/tmp/mono_snap.pkl"

if "--rebuild" in sys.argv or not os.path.exists(SNAP):
    from gdslam_tpu.system.tracking import Tracking
    from gdslam_tpu.backend.loop_closing import LoopCloser
    tr = Tracking(SCFG, kmax=64, pmax=32768)
    lc = LoopCloser(SCFG, voc.default_vocabulary(), 64)
    lc.fix_scale = False
    tr.loop_closer = lc
    t0 = time.time()
    for i in range(170):
        fr = synthetic.render(synthetic.gt_pose_loop_mono(i, N_FRAMES),
                              SCAM, False, 30.0, i)
        tr.process_mono(fr.gray, i / 30.0)
    tr.flush()
    print("tracked 170 frames in", time.time() - t0, "state", tr.state.name)
    arena_np = jax.tree.map(np.asarray, tr.arena)
    with open(SNAP, "wb") as f:
        pickle.dump({"arena": arena_np, "kf_timestamps": tr.kf_timestamps,
                     "n_kf": tr.n_kf_host,
                     "db": jax.tree.map(np.asarray, lc.db)}, f)
    print("snapshot saved")

with open(SNAP, "rb") as f:
    snap = pickle.load(f)
from gdslam_tpu.backend import map_arena as ma
from gdslam_tpu.backend.loop_closing import LoopCloser
arena = jax.tree.map(jnp.asarray, snap["arena"])
kf_timestamps = snap["kf_timestamps"]
n = snap["n_kf"]
lc = LoopCloser(SCFG, voc.default_vocabulary(), 64)
lc.fix_scale = False
lc.db = jax.tree.map(jnp.asarray, snap["db"])


def seg_ratios(arena):
    T0 = np.asarray(synthetic.gt_pose_loop_mono(0, N_FRAMES))
    cs, gs = [], []
    for k, ts in enumerate(kf_timestamps):
        i = int(round(ts * 30.0))
        cs.append(np.linalg.inv(np.asarray(arena.kf_pose[k]))[:3, 3])
        gs.append((np.linalg.inv(T0) @ np.asarray(
            synthetic.gt_pose_loop_mono(i, N_FRAMES)))[:3, 3])
    cs, gs = np.asarray(cs), np.asarray(gs)
    de = np.linalg.norm(np.diff(cs, axis=0), axis=1)
    dg = np.linalg.norm(np.diff(gs, axis=0), axis=1)
    keep = dg > 1e-3
    return de[keep] / dg[keep], keep


k0 = n // 2
s_inj = 1.2
r_nat, keep = seg_ratios(arena)
seg_is_new = (np.arange(1, n)[keep] > k0)
zone_nat = np.mean(r_nat[seg_is_new]) / np.mean(r_nat[~seg_is_new])
frames = [int(round(ts * 30)) % N_FRAMES for ts in kf_timestamps[:n]]
cur = n - 1
cand = min(range(k0), key=lambda k: min(abs(frames[k] - frames[cur]),
                                        N_FRAMES - abs(frames[k] - frames[cur])))
ok_nat, _, _ = lc.compute_transform(arena, cur, cand)
s_nat = float(lc.last_sim3[2]) if ok_nat else 1.0
print(f"n={n} k0={k0} cur={cur} cand={cand} zone_nat={zone_nat:.4f} s_nat={s_nat:.4f}")

# inject
c0 = np.linalg.inv(np.asarray(arena.kf_pose[k0]))[:3, 3]
poses = np.asarray(arena.kf_pose).copy()
for k in range(k0, n):
    Twc = np.linalg.inv(poses[k])
    Twc[:3, 3] = c0 + s_inj * (Twc[:3, 3] - c0)
    poses[k] = np.linalg.inv(Twc)
sel = (np.asarray(arena.pt_ref_kf) >= k0) & np.asarray(arena.pt_valid)
pts = np.asarray(arena.pt_pos).copy()
pts[sel] = c0 + s_inj * (pts[sel] - c0)
obs = np.asarray(arena.kf_obs).copy()
n_obs = np.asarray(arena.pt_n_obs).copy()
pt_ref = np.asarray(arena.pt_ref_kf)
for k in range(n):
    other = (pt_ref < k0) if k >= k0 else (pt_ref >= k0)
    cut = (obs[k] >= 0) & other[np.maximum(obs[k], 0)]
    n_obs[obs[k][cut]] -= 1
    obs[k][cut] = -1
covis = np.asarray(arena.covis).copy()
covis[:k0, k0:n] = 0
covis[k0:n, :k0] = 0
parent = np.asarray(arena.kf_parent).copy()
for k in range(k0, n):
    if parent[k] < k0:
        parent[k] = k - 1
arena_i = arena._replace(
    kf_parent=jnp.asarray(parent), kf_pose=jnp.asarray(poses),
    pt_pos=jnp.asarray(pts), kf_obs=jnp.asarray(obs),
    pt_n_obs=jnp.asarray(np.maximum(n_obs, 0)), covis=jnp.asarray(covis))

r_pre, keep = seg_ratios(arena_i)
seg_is_new = (np.arange(1, n)[keep] > k0)
zone_pre = np.mean(r_pre[seg_is_new]) / np.mean(r_pre[~seg_is_new])
print(f"zone_pre={zone_pre:.4f} (ratio vs nat {zone_pre/zone_nat:.4f})")

ok, T, n_m = lc.compute_transform(arena_i, cur, cand)
print(f"compute_transform ok={ok} n_m={n_m} s12={float(lc.last_sim3[2]):.4f} "
      f"s_expect={s_inj*s_nat:.4f}")

arena2 = lc.correct(arena_i, cur, cand, T)
r_post, keep = seg_ratios(arena2)
seg_is_new = (np.arange(1, n)[keep] > k0)
zone_post = np.mean(r_post[seg_is_new]) / np.mean(r_post[~seg_is_new])
print(f"zone_post={zone_post:.4f}  need |zone_post-1|<0.10 and "
      f"<0.5*|zone_pre-1|={0.5*abs(zone_pre-1):.4f}")
print("per-segment post ratios:", np.round(r_post, 3))

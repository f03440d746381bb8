"""Round-4 verify probe: drive the changed BA/GBA paths on the real TPU.

- run_local_ba (now LM-controlled): perturbed-map improvement + degenerate
  (all-invalid-edges) input must not NaN.
- global_bundle_adjustment (now matrix-free PCG + LM): perturbed-map
  improvement on TPU must match the CPU test's contract (>=2x max-pose-error
  reduction) and stay finite.
"""
import sys, time
sys.path.insert(0, ".")
sys.path.insert(0, "tests")
import jax
print("devices:", jax.devices())
import jax.numpy as jnp
import numpy as np
from test_ba import CFG, make_arena, pose_errors
from gdslam_tpu.backend import gba, ba

rng = np.random.default_rng(0)
arena, poses_gt, pts_gt = make_arena(rng, pose_noise=0.02)
e0 = pose_errors(arena, poses_gt).max()
t0 = time.time()
out = gba.global_bundle_adjustment(arena, CFG, sweeps=6)
e1 = pose_errors(out, poses_gt).max()
print(f"GBA: max pose err {e0:.4f} -> {e1:.4f} ({time.time()-t0:.1f}s) "
      f"finite={bool(jnp.all(jnp.isfinite(out.pt_pos)))}")
assert e1 < 0.5 * e0, "GBA did not improve 2x on TPU"

# local BA improvement (public entry, now LM-controlled inside)
arena2, poses_gt2, _ = make_arena(rng, pose_noise=0.02)
t0 = time.time()
out2, n_out = ba.local_bundle_adjustment(arena2, 5, CFG)
e2a = pose_errors(arena2, poses_gt2).max()
e2b = pose_errors(out2, poses_gt2).max()
print(f"localBA: max pose err {e2a:.4f} -> {e2b:.4f} ({time.time()-t0:.1f}s)")
assert e2b < e2a

# degenerate: zero valid observations -> poses unchanged, no NaN
arena3 = arena2._replace(kf_obs=jnp.full_like(arena2.kf_obs, -1))
out3, _ = ba.local_bundle_adjustment(arena3, 5, CFG)
assert bool(jnp.all(jnp.isfinite(out3.kf_pose))), "NaN on empty problem"
print("degenerate empty-edge local BA: finite OK")
print("VERIFY r4 BA/GBA: PASS")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdslam_tpu.ops import hamming, orb, pallas_match


@pytest.mark.parametrize("M,N", [(1024, 512), (2048, 768)])
def test_matches_jnp_reference_exactly(rng, M, N):
    cand_uv = jnp.asarray(rng.uniform(0, 640, (M, 2)), jnp.float32)
    kp_uv = jnp.asarray(rng.uniform(0, 640, (N, 2)), jnp.float32)
    cd = jnp.asarray(rng.integers(0, 256, (M, 32)), jnp.uint8)
    kd = jnp.asarray(rng.integers(0, 256, (N, 32)), jnp.uint8)
    cand_valid = jnp.asarray(rng.uniform(size=M) > 0.1)
    kp_valid = jnp.asarray(rng.uniform(size=N) > 0.1)
    c_lvl = jnp.asarray(rng.integers(0, 8, M), jnp.int32)
    k_lvl = jnp.asarray(rng.integers(0, 8, N), jnp.int32)
    radius = jnp.full((M,), 60.0)
    cp = orb.descriptors_pm1(cd, cand_valid)
    kp = orb.descriptors_pm1(kd, kp_valid)

    best, second, arg = pallas_match.match_top2(
        cand_uv, cp, radius, c_lvl, cand_valid, kp_uv, kp, k_lvl, kp_valid)

    D = hamming.hamming_matrix(cp, kp).astype(jnp.float32)
    du = cand_uv[:, None, 0] - kp_uv[None, :, 0]
    dv = cand_uv[:, None, 1] - kp_uv[None, :, 1]
    ok = (du * du + dv * dv <= 3600.0) & \
        (jnp.abs(c_lvl[:, None] - k_lvl[None, :]) <= 1) & \
        cand_valid[:, None] & kp_valid[None, :]
    cost = jnp.where(ok, D, pallas_match.BIG)
    b_ref, s_ref, a_ref = hamming.best_two(cost, axis=0)
    np.testing.assert_array_equal(np.asarray(best),
                                  np.minimum(np.asarray(b_ref), pallas_match.BIG))
    np.testing.assert_array_equal(np.asarray(second),
                                  np.minimum(np.asarray(s_ref), pallas_match.BIG))
    matched = np.asarray(best) < pallas_match.BIG
    np.testing.assert_array_equal(np.asarray(arg)[matched],
                                  np.asarray(a_ref)[matched])

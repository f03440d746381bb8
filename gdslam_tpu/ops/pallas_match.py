"""Pallas TPU kernel: fused projection-guided descriptor matching.

The jnp matcher (frontend/matcher.py) materializes [M, N] Hamming, pixel-
distance, and mask matrices in HBM (3 x 4096 x 1536 x 4 B ~ 75 MB of traffic
per call). This kernel streams candidate blocks through VMEM and keeps only
the running (best, second-best, argbest) per keypoint — flash-attention
structure applied to feature matching. The Hamming core stays an int8 MXU
matmul per (keypoint-tile x candidate-block).

Semantics match matcher.match_candidates' pre-one-to-one stage exactly:
cost = Hamming if (within radius & level window & both valid) else BIG;
returns per-keypoint best cost, second cost, best candidate row.

MEASURED RESULT (v5e, M=4096, N=1536): bit-exact vs the jnp matcher but
20.3 ms vs 2.7 ms — XLA's own fusion already streams the [M, N]
intermediates through registers for these shapes, and the hand-rolled
fori_loop block pipeline loses to it. The kernel is kept (a) as the scaffold
for candidate sets large enough that the [M, N] materialization becomes
real (M >~ 10^5 map points for dense global relocalization), and (b) as the
in-repo Pallas reference; the production matcher stays on the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = float(1 << 20)   # python float: jnp scalars become captured consts in pallas
KP_TILE = 256      # keypoints per program
CAND_BLK = 512     # candidate rows per streamed block


def _kernel(cand_uv_ref, cand_pm1_ref, cand_meta_ref,
            kp_uv_ref, kp_pm1_ref, kp_meta_ref,
            best_ref, second_ref, arg_ref):
    """One keypoint tile vs all candidate blocks.

    cand_meta: [M, 2] (radius^2, level); kp_meta: [N_tile, 2] (valid, level).
    """
    M = cand_uv_ref.shape[0]
    n_blocks = M // CAND_BLK

    kp_pm1 = kp_pm1_ref[:].astype(jnp.int8)            # [T, 256]
    kp_u = kp_uv_ref[:, 0]
    kp_v = kp_uv_ref[:, 1]
    kp_valid = kp_meta_ref[:, 0] > 0
    kp_level = kp_meta_ref[:, 1]

    def body(blk, carry):
        best, second, arg = carry
        s = blk * CAND_BLK
        c_pm1 = cand_pm1_ref[pl.ds(s, CAND_BLK), :].astype(jnp.int8)
        c_u = cand_uv_ref[pl.ds(s, CAND_BLK), 0]
        c_v = cand_uv_ref[pl.ds(s, CAND_BLK), 1]
        c_r2 = cand_meta_ref[pl.ds(s, CAND_BLK), 0]
        c_lvl = cand_meta_ref[pl.ds(s, CAND_BLK), 1]
        dot = jax.lax.dot_general(
            c_pm1, kp_pm1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)          # [B, T]
        ham = (256 - dot) >> 1
        du = c_u[:, None] - kp_u[None, :]
        dv = c_v[:, None] - kp_v[None, :]
        within = du * du + dv * dv <= c_r2[:, None]
        lvl_ok = jnp.abs(c_lvl[:, None] - kp_level[None, :]) <= 1.0
        ok = within & lvl_ok & (c_r2[:, None] > 0) & kp_valid[None, :]
        cost = jnp.where(ok, ham.astype(jnp.float32), BIG)
        # block-best per keypoint + argmin (via iota trick)
        blk_min = jnp.min(cost, axis=0)                # [T]
        rows = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0) + s
        blk_arg = jnp.min(jnp.where(cost == blk_min[None, :], rows,
                                    jnp.int32(1 << 30)), axis=0)
        # second-best within block: mask one instance of the min
        is_min_row = rows == blk_arg[None, :]
        cost2 = jnp.where(is_min_row, BIG, cost)
        blk_min2 = jnp.min(cost2, axis=0)
        # merge running top-2
        new_best = jnp.minimum(best, blk_min)
        new_arg = jnp.where(blk_min < best, blk_arg, arg)
        new_second = jnp.minimum(jnp.maximum(best, blk_min),
                                 jnp.minimum(second, blk_min2))
        return new_best, new_second, new_arg

    T = kp_pm1.shape[0]
    init = (jnp.full((T,), BIG), jnp.full((T,), BIG),
            jnp.full((T,), 1 << 30, jnp.int32))
    best, second, arg = jax.lax.fori_loop(0, n_blocks, body, init)
    i = pl.program_id(0)
    best_ref[i, :] = best
    second_ref[i, :] = second
    arg_ref[i, :] = jnp.where(arg == 1 << 30, -1, arg)


@partial(jax.jit, static_argnums=())
def match_top2(cand_uv, cand_pm1, cand_radius, cand_level, cand_valid,
               kp_uv, kp_pm1, kp_level, kp_valid):
    """Streaming fused matcher. Shapes are padded to tile multiples.

    Returns (best [N], second [N], arg [N] int32, -1 = none).
    """
    M, N = cand_uv.shape[0], kp_uv.shape[0]
    M_pad = -(-M // CAND_BLK) * CAND_BLK
    N_pad = -(-N // KP_TILE) * KP_TILE

    def pad(x, n, fill=0):
        return jnp.pad(x, [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    # radius^2 <= 0 encodes an invalid candidate row.
    r2 = jnp.where(cand_valid, cand_radius * cand_radius, 0.0)
    cand_meta = pad(jnp.stack([r2, cand_level.astype(jnp.float32)], 1), M_pad)
    kp_meta = pad(jnp.stack([kp_valid.astype(jnp.float32),
                             kp_level.astype(jnp.float32)], 1), N_pad)
    cand_uv_p = pad(cand_uv, M_pad)
    cand_pm1_p = pad(cand_pm1, M_pad)
    kp_uv_p = pad(kp_uv, N_pad)
    kp_pm1_p = pad(kp_pm1, N_pad)

    grid = (N_pad // KP_TILE,)
    # CPU (tests / virtual mesh) only supports the Pallas interpreter.
    interpret = jax.devices()[0].platform == "cpu"
    best, second, arg = pl.pallas_call(
        _kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            # the whole candidate set fits VMEM (4096x256 int8 = 1 MB)
            pl.BlockSpec((M_pad, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M_pad, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M_pad, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP_TILE, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # full-array blocks; each (sequential) program writes its row
            pl.BlockSpec((N_pad // KP_TILE, KP_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_pad // KP_TILE, KP_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_pad // KP_TILE, KP_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_pad // KP_TILE, KP_TILE), jnp.float32),
            jax.ShapeDtypeStruct((N_pad // KP_TILE, KP_TILE), jnp.float32),
            jax.ShapeDtypeStruct((N_pad // KP_TILE, KP_TILE), jnp.int32),
        ],
    )(cand_uv_p, cand_pm1_p, cand_meta, kp_uv_p, kp_pm1_p, kp_meta)
    return (best.reshape(-1)[:N], second.reshape(-1)[:N],
            arg.reshape(-1)[:N])

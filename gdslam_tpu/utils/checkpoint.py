"""Map checkpoint save/load.

The reference leaves SaveMap/LoadMap as TODOs (System.h:113-115); flat
arenas make it trivial here: the whole SLAM map state (keyframes, points,
covisibility, cursors) serializes to one .npz. Runs are resumable —
a genuine capability upgrade (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import numpy as np

from gdslam_tpu.backend import map_arena as ma


def save_map(arena: ma.MapArena, path: str) -> None:
    np.savez_compressed(path, **{k: np.asarray(v)
                                 for k, v in arena._asdict().items()})


def load_map(path: str) -> ma.MapArena:
    import jax.numpy as jnp
    z = np.load(path)
    return ma.MapArena(**{k: jnp.asarray(z[k]) for k in ma.MapArena._fields})

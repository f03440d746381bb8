"""Map checkpoint save/load.

The reference leaves SaveMap/LoadMap as TODOs (System.h:113-115); flat
arenas make it trivial here: the whole SLAM map state (keyframes, points,
covisibility, cursors) serializes to one .npz. Runs are resumable —
a genuine capability upgrade (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import numpy as np

from gdslam_tpu.backend import map_arena as ma


def save_map(arena: ma.MapArena, path: str,
             kf_timestamps: list[float] | None = None) -> None:
    extra = {}
    if kf_timestamps is not None:
        # float64 on the host: device kf_time is float32, which cannot
        # represent TUM epoch timestamps (~1.3e9 s, ULP = 128 s).
        extra["kf_timestamps_f64"] = np.asarray(kf_timestamps, np.float64)
    np.savez_compressed(path, **{k: np.asarray(v)
                                 for k, v in arena._asdict().items()}, **extra)


def load_map(path: str) -> ma.MapArena:
    arena, _ = load_map_with_timestamps(path)
    return arena


def load_map_with_timestamps(path: str) -> tuple[ma.MapArena, list[float]]:
    import jax.numpy as jnp
    z = np.load(path)
    arena = ma.MapArena(**{k: jnp.asarray(z[k]) for k in ma.MapArena._fields})
    ts = list(z["kf_timestamps_f64"]) if "kf_timestamps_f64" in z else []
    return arena, ts

"""Trajectory file writers, byte-compatible with the reference's formats.

- TUM:   `timestamp tx ty tz qx qy qz qw` with setprecision(6)/(9)
  (System::SaveTrajectoryTUM / SaveKeyFrameTrajectoryTUM, System.cc:418-513)
- KITTI: 3x4 row-major pose per line, setprecision(9)
  (System::SaveTrajectoryKITTI, System.cc:543-596)
"""

from __future__ import annotations

import numpy as np

from gdslam_tpu.core import lie


def _tum_line(ts: float, T_wc: np.ndarray) -> str:
    import jax.numpy as jnp
    t = T_wc[:3, 3]
    q = np.asarray(lie.mat_to_quat(jnp.asarray(T_wc[:3, :3])))
    return (f"{ts:.6f} {t[0]:.9g} {t[1]:.9g} {t[2]:.9g} "
            f"{q[0]:.9g} {q[1]:.9g} {q[2]:.9g} {q[3]:.9g}\n")


def save_tum(path: str, trajectory) -> None:
    """trajectory: iterable of (timestamp, T_wc 4x4)."""
    with open(path, "w") as f:
        for ts, T in trajectory:
            f.write(_tum_line(ts, np.asarray(T)))


def save_kitti(path: str, trajectory) -> None:
    with open(path, "w") as f:
        for _, T in trajectory:
            row = np.asarray(T)[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9g}" for v in row) + "\n")


def load_tum(path: str):
    """Read a TUM trajectory file -> list of (timestamp, T_wc)."""
    import jax.numpy as jnp
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.split()]
            ts, tx, ty, tz, qx, qy, qz, qw = vals[:8]
            R = np.asarray(lie.quat_to_mat(jnp.asarray([qx, qy, qz, qw])))
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = [tx, ty, tz]
            out.append((ts, T))
    return out

"""Dataset / cloud IO: CSV, PCD, TUM trajectories, KITTI, synthetic replay.

TPU-native replacement for the reference's IO surface:
  - DataPoints CSV/PCD load-save (reference libpointmatcher/pointmatcher/
    IO.cpp — CSV with header autodetect; we support the x,y,z[,nx,ny,nz]
    layout its example data uses),
  - TUM-style pose log writing (reference RosbagRangeDataProcessorRos.cpp:
    267-277 — '# timestamp x y z q_x q_y q_z q_w'),
  - PCD ascii/binary export of maps (reference SlamWrapper::saveMap,
    SlamWrapper.cpp:545-582).
Host-side numpy (this is the host I/O layer; the device only sees padded
fixed-capacity batches).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .pointcloud import PointCloud, make_cloud
from . import se3

import jax.numpy as jnp


def load_csv_cloud(path: str, capacity: Optional[int] = None) -> PointCloud:
    """Load an x,y,z[,nx,ny,nz] cloud in CSV or whitespace table form.

    Handles both layouts of the libpointmatcher example data: headered CSV
    ('x,y,z,nx,ny,nz') and headerless whitespace columns (IO.cpp's CSV
    loader autodetects the same way).
    """
    with open(path) as f:
        first = f.readline().strip()
    delimiter = "," if "," in first else None
    try:
        [float(tok) for tok in (first.split(",") if delimiter else first.split())]
        has_header = False
    except ValueError:
        has_header = True
    data = np.loadtxt(path, delimiter=delimiter, skiprows=1 if has_header else 0,
                      dtype=np.float32)
    if data.ndim == 1:
        data = data[None, :]
    if has_header:
        cols = [c.strip().lower() for c in (first.split(",") if delimiter else first.split())]
        name_to_col = {n: i for i, n in enumerate(cols)}
        xyz = data[:, [name_to_col["x"], name_to_col["y"], name_to_col["z"]]]
        normals = None
        if all(k in name_to_col for k in ("nx", "ny", "nz")):
            normals = data[:, [name_to_col["nx"], name_to_col["ny"], name_to_col["nz"]]]
    else:
        xyz = data[:, :3]
        normals = data[:, 3:6] if data.shape[1] >= 6 else None
    return make_cloud(xyz, normals=normals, capacity=capacity)


def save_pcd(path: str, cloud: PointCloud, binary: bool = True) -> None:
    """Write a PCD v0.7 file with xyz (+ normals when present)."""
    from .pointcloud import to_numpy

    xyz, normals = to_numpy(cloud)
    has_n = np.any(np.abs(normals) > 1e-9)
    fields = ["x", "y", "z"] + (["normal_x", "normal_y", "normal_z"] if has_n else [])
    data = np.hstack([xyz, normals]) if has_n else xyz
    n = xyz.shape[0]
    header = "\n".join([
        "# .PCD v0.7 - Point Cloud Data file format",
        "VERSION 0.7",
        f"FIELDS {' '.join(fields)}",
        f"SIZE {' '.join(['4'] * len(fields))}",
        f"TYPE {' '.join(['F'] * len(fields))}",
        f"COUNT {' '.join(['1'] * len(fields))}",
        f"WIDTH {n}",
        "HEIGHT 1",
        "VIEWPOINT 0 0 0 1 0 0 0",
        f"POINTS {n}",
        f"DATA {'binary' if binary else 'ascii'}",
    ]) + "\n"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if binary:
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(data.astype("<f4").tobytes())
    else:
        with open(path, "w") as f:
            f.write(header)
            np.savetxt(f, data, fmt="%.6f")


def load_pcd(path: str, capacity: Optional[int] = None) -> PointCloud:
    """Read PCD v0.7 ascii/binary with float32 fields."""
    with open(path, "rb") as f:
        fields, sizes, n = [], [], 0
        data_mode = "ascii"
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("FIELDS"):
                fields = line.split()[1:]
            elif line.startswith("SIZE"):
                sizes = [int(s) for s in line.split()[1:]]
            elif line.startswith("POINTS"):
                n = int(line.split()[1])
            elif line.startswith("DATA"):
                data_mode = line.split()[1]
                break
        ncol = len(fields)
        if data_mode == "binary":
            raw = f.read(n * ncol * 4)
            data = np.frombuffer(raw, dtype="<f4").reshape(n, ncol).copy()
        else:
            data = np.loadtxt(f, dtype=np.float32).reshape(n, ncol)
    col = {name: i for i, name in enumerate(fields)}
    xyz = data[:, [col["x"], col["y"], col["z"]]]
    normals = None
    if "normal_x" in col:
        normals = data[:, [col["normal_x"], col["normal_y"], col["normal_z"]]]
    return make_cloud(xyz, normals=normals, capacity=capacity)


# ---------------------------------------------------------------------------
# Trajectories
# ---------------------------------------------------------------------------

def save_tum_trajectory(path: str, times: List[float], poses: List[np.ndarray]) -> None:
    """TUM format: '# timestamp x y z q_x q_y q_z q_w' (one pose per line),
    the exact layout of the reference's offline pose log."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("# timestamp x y z q_x q_y q_z q_w\n")
        for t, T in zip(times, poses):
            T = np.asarray(T)
            q = np.asarray(se3.quat_from_matrix(jnp.asarray(T[:3, :3])))  # (w,x,y,z)
            x, y, z = T[:3, 3]
            f.write(f"{t:.9f} {x:.6f} {y:.6f} {z:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")


def load_tum_trajectory(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (times [N], poses [N,4,4])."""
    rows = np.loadtxt(path, comments="#", dtype=np.float64)
    if rows.ndim == 1:
        rows = rows[None, :]
    times = rows[:, 0]
    poses = []
    for r in rows:
        x, y, z, qx, qy, qz, qw = r[1:8]
        R = np.asarray(se3.quat_to_matrix(jnp.asarray([qw, qx, qy, qz], dtype=jnp.float32)))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = [x, y, z]
        poses.append(T)
    return times, np.stack(poses)


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE after optional SE(3) (Umeyama) alignment
    — the evo-style metric the reference's pose log is consumed with
    (SURVEY.md §5 observability)."""
    p_est = np.asarray([T[:3, 3] for T in est_poses])
    p_gt = np.asarray([T[:3, 3] for T in gt_poses])
    if align and len(p_est) >= 3:
        mu_e, mu_g = p_est.mean(0), p_gt.mean(0)
        de, dg = p_est - mu_e, p_gt - mu_g
        S = dg.T @ de / len(p_est)
        U, _, Vt = np.linalg.svd(S)
        C = np.eye(3)
        C[2, 2] = np.sign(np.linalg.det(U @ Vt))
        R = U @ C @ Vt
        p_est = (R @ de.T).T + mu_g
        p_gt = dg + mu_g
    err = p_est - p_gt
    return float(np.sqrt((err**2).sum(axis=1).mean()))

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


def save_ply(path: str, cloud: PointCloud, binary: bool = True,
             colors: Optional[np.ndarray] = None) -> None:
    """Write a PLY file (ascii or binary_little_endian) with xyz, optional
    normals and optional uint8 RGB colors.

    ≙ DataPoints PLY save (reference libpointmatcher/pointmatcher/IO.cpp
    PLYElement writers, IO.h:182-227).
    """
    from .pointcloud import to_numpy

    xyz, normals = to_numpy(cloud)
    if colors is None and all(cloud.has_attr(k) for k in ("r", "g", "b")):
        mask = np.asarray(cloud.mask)
        rgb = np.stack([np.asarray(cloud.attr(k))[mask] for k in ("r", "g", "b")], -1)
        colors = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    has_n = np.any(np.abs(normals) > 1e-9)
    n = xyz.shape[0]
    props = ["property float x", "property float y", "property float z"]
    if has_n:
        props += ["property float nx", "property float ny", "property float nz"]
    if colors is not None:
        colors = np.asarray(colors, dtype=np.uint8)[: n]
        props += ["property uchar red", "property uchar green", "property uchar blue"]
    header = "\n".join(
        ["ply",
         f"format {'binary_little_endian' if binary else 'ascii'} 1.0",
         f"element vertex {n}"] + props + ["end_header"]) + "\n"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if binary:
        # Structured dtype so mixed float/uchar rows pack correctly.
        fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
        if has_n:
            fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
        if colors is not None:
            fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        rec = np.empty(n, dtype=fields)
        rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        if has_n:
            rec["nx"], rec["ny"], rec["nz"] = normals[:, 0], normals[:, 1], normals[:, 2]
        if colors is not None:
            rec["red"], rec["green"], rec["blue"] = colors[:, 0], colors[:, 1], colors[:, 2]
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(rec.tobytes())
    else:
        with open(path, "w") as f:
            f.write(header)
            for i in range(n):
                row = list(xyz[i])
                if has_n:
                    row += list(normals[i])
                line = " ".join(f"{v:.6f}" for v in row)
                if colors is not None:
                    line += " " + " ".join(str(int(v)) for v in colors[i])
                f.write(line + "\n")


def load_ply(path: str, capacity: Optional[int] = None) -> PointCloud:
    """Read PLY (ascii / binary_little_endian) vertex clouds with optional
    normals; red/green/blue colors load into r/g/b attrs ([0,1])."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n = 0
        props: List[Tuple[str, str]] = []  # (type, name), vertex element only
        in_vertex = False
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                in_vertex = name == "vertex"
                if in_vertex:
                    n = int(cnt)
            elif line.startswith("property") and in_vertex:
                toks = line.split()
                if toks[1] == "list":
                    raise ValueError("list properties unsupported in vertex element")
                props.append((toks[1], toks[2]))
            elif line == "end_header":
                break
        type_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
                    "short": "<i2", "ushort": "<u2", "int": "<i4",
                    "int32": "<i4", "uint": "<u4", "uint32": "<u4"}
        if fmt == "binary_little_endian":
            rec_dt = np.dtype([(name, type_map[t]) for t, name in props])
            rec = np.frombuffer(f.read(n * rec_dt.itemsize), dtype=rec_dt, count=n)
            get = lambda name: rec[name].astype(np.float32)
        elif fmt == "ascii":
            data = np.loadtxt(f, dtype=np.float64, max_rows=n)
            if data.ndim == 1:
                data = data[None, :]
            cols = {name: i for i, (_, name) in enumerate(props)}
            get = lambda name: data[:, cols[name]].astype(np.float32)
        else:
            raise ValueError(f"unsupported PLY format: {fmt}")
    names = [name for _, name in props]
    xyz = np.stack([get("x"), get("y"), get("z")], axis=-1)
    normals = None
    if all(k in names for k in ("nx", "ny", "nz")):
        normals = np.stack([get("nx"), get("ny"), get("nz")], axis=-1)
    attrs = None
    if all(k in names for k in ("red", "green", "blue")):
        attrs = {k: get(src) / 255.0
                 for k, src in (("r", "red"), ("g", "green"), ("b", "blue"))}
    return make_cloud(xyz, normals=normals, capacity=capacity, attrs=attrs)


def save_vtk(path: str, cloud: PointCloud) -> None:
    """Write a legacy-ASCII VTK POLYDATA point cloud (+ normals when present).

    ≙ DataPoints::saveVTK (reference libpointmatcher/pointmatcher/IO.cpp /
    VTKFileInspector output format) — the format its golden-test clouds use.
    """
    from .pointcloud import to_numpy

    xyz, normals = to_numpy(cloud)
    has_n = np.any(np.abs(normals) > 1e-9)
    n = xyz.shape[0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write("open3d_slam_advanced_rss_2024_public_tpu cloud\n")
        f.write("ASCII\nDATASET POLYDATA\n")
        f.write(f"POINTS {n} float\n")
        np.savetxt(f, xyz, fmt="%.6f")
        f.write(f"VERTICES {n} {2 * n}\n")
        for i in range(n):
            f.write(f"1 {i}\n")
        if has_n:
            f.write(f"POINT_DATA {n}\n")
            f.write("NORMALS normals float\n")
            np.savetxt(f, normals, fmt="%.6f")


def load_vtk(path: str, capacity: Optional[int] = None) -> PointCloud:
    """Read legacy-ASCII VTK POLYDATA/UNSTRUCTURED_GRID points + NORMALS."""
    xyz = None
    normals = None
    with open(path) as f:
        lines = f.readlines()
    i = 0
    n = 0

    def read_floats(start: int, count: int) -> Tuple[np.ndarray, int]:
        vals: List[float] = []
        j = start
        while len(vals) < count and j < len(lines):
            vals.extend(float(tok) for tok in lines[j].split())
            j += 1
        return np.asarray(vals[:count], dtype=np.float32), j

    while i < len(lines):
        toks = lines[i].split()
        if toks and toks[0] == "POINTS":
            n = int(toks[1])
            flat, i = read_floats(i + 1, 3 * n)
            xyz = flat.reshape(n, 3)
            continue
        if toks and toks[0] == "NORMALS":
            flat, i = read_floats(i + 1, 3 * n)
            normals = flat.reshape(n, 3)
            continue
        i += 1
    if xyz is None:
        raise ValueError(f"{path}: no POINTS section found")
    return make_cloud(xyz, normals=normals, capacity=capacity)


_LOADERS = {".csv": load_csv_cloud, ".xyz": load_csv_cloud, ".pcd": load_pcd,
            ".ply": load_ply, ".vtk": load_vtk}


def load_cloud(path: str, capacity: Optional[int] = None) -> PointCloud:
    """Load a cloud, dispatching on extension (csv/xyz/pcd/ply/vtk) —
    ≙ DataPoints::load (reference IO.cpp extension dispatch)."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in _LOADERS:
        raise ValueError(f"unsupported cloud format {ext!r} (known: {sorted(_LOADERS)})")
    return _LOADERS[ext](path, capacity=capacity)


def save_cloud(path: str, cloud: PointCloud, binary: bool = True) -> None:
    """Save a cloud, dispatching on extension (pcd/ply/vtk)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pcd":
        save_pcd(path, cloud, binary=binary)
    elif ext == ".ply":
        save_ply(path, cloud, binary=binary)
    elif ext == ".vtk":
        save_vtk(path, cloud)
    else:
        raise ValueError(f"unsupported cloud format {ext!r} (known: .pcd .ply .vtk)")


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

"""Dataset loaders and trajectory I/O.

Parity with the reference's dataset contract:
  * "unreal": ASCII ray-depth maps (whitespace-separated floats, row-major,
    values > 100 m zeroed) + ray-depth -> z-depth conversion
    (InputOutput.cpp:12-41, Geometry.cpp:11-36,
    blur_aware_direct_tracker.cpp:373-378);
  * "eth3d": 16-bit PNG depth divided by 5000
    (blur_aware_direct_tracker.cpp:379-386);
  * sorted image-folder reading (ImageFolderReader.h:41-62);
  * TUM-format trajectory / control-knot files
    ("t x y z qx qy qz qw", # comments — Spline.h:43-87);
  * PLY point-cloud export (InputOutput.cpp:43-68);
  * Unreal ground-truth pose and IMU logs (InputOutput.cpp:71-150).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".pgm")


# ------------------------------------------------------------------ depth maps


def load_depth_ascii(path: str, height: int, width: int) -> np.ndarray:
    """Unreal ASCII depth map: H*W floats, >100 m clamped to 0
    (reference InputOutput.cpp:12-41)."""
    vals = np.loadtxt(path).reshape(-1)
    if vals.size != height * width:
        raise ValueError(
            f"{path}: expected {height * width} depth values, got {vals.size}"
        )
    depth = vals.reshape(height, width).astype(np.float32)
    depth[depth > 100.0] = 0.0
    return depth


def ray_depth_to_z(depth_ray: np.ndarray, K: Sequence[float]) -> np.ndarray:
    """Convert distance-along-ray depth to z-depth: z = d / |unit ray|_z^-1,
    i.e. z = d * z_hat with z_hat = 1/sqrt(1 + x_n^2 + y_n^2)
    (reference Geometry.cpp:11-36 convert_ray_d_to_z)."""
    H, W = depth_ray.shape
    fx, fy, cx, cy = K
    xs = (np.arange(W) - cx) / fx
    ys = (np.arange(H) - cy) / fy
    xn, yn = np.meshgrid(xs, ys)
    z_hat = 1.0 / np.sqrt(1.0 + xn * xn + yn * yn)
    return (depth_ray * z_hat).astype(np.float32)


def load_depth_png16(path: str, scale: float = 5000.0) -> np.ndarray:
    """ETH3D-style 16-bit PNG depth / 5000 -> meters
    (reference blur_aware_direct_tracker.cpp:379-386)."""
    from PIL import Image as PILImage

    img = np.asarray(PILImage.open(path))
    return (img.astype(np.float32)) / scale


def load_depth(
    path: str,
    dataset_type: str,
    K: Optional[Sequence[float]] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
) -> np.ndarray:
    """Dispatch on the reference's datasetType contract
    (blur_aware_direct_tracker.cpp:368-386)."""
    if dataset_type == "unreal":
        if K is None or height is None or width is None:
            raise ValueError("unreal depth needs K + image size")
        return ray_depth_to_z(load_depth_ascii(path, height, width), K)
    if dataset_type == "eth3d":
        return load_depth_png16(path)
    raise ValueError(f"unknown dataset type {dataset_type!r}")


# ---------------------------------------------------------------- image folder


def list_image_folder(folder: str) -> List[str]:
    """Sorted list of image paths (reference ImageFolderReader.h:41-62)."""
    names = sorted(
        f for f in os.listdir(folder)
        if f.lower().endswith(IMAGE_EXTENSIONS)
    )
    return [os.path.join(folder, f) for f in names]


def load_gray_image(path: str) -> np.ndarray:
    """Load an image as float32 grayscale in [0, 255]."""
    from PIL import Image as PILImage

    img = PILImage.open(path)
    if img.mode not in ("L", "I", "F"):
        img = img.convert("L")
    return np.asarray(img, dtype=np.float32)


# --------------------------------------------------------------- trajectory IO


def load_tum_trajectory(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load 't x y z qx qy qz qw' lines, '#' comments skipped
    (reference Spline.h:43-87 LoadFromFile format).
    Returns (times [N], t [N,3], q_xyzw [N,4])."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = [float(x) for x in line.split()]
            if len(parts) < 8:
                continue
            rows.append(parts[:8])
    arr = np.asarray(rows, dtype=np.float64)
    return arr[:, 0], arr[:, 1:4], arr[:, 4:8]


def save_tum_trajectory(
    path: str, times: np.ndarray, t: np.ndarray, q_xyzw: np.ndarray,
    header: str = "timestamp tx ty tz qx qy qz qw",
) -> None:
    with open(path, "w") as f:
        f.write(f"# {header}\n")
        for i in range(len(times)):
            f.write(
                f"{times[i]:.9f} "
                + " ".join(f"{v:.9f}" for v in t[i])
                + " "
                + " ".join(f"{v:.9f}" for v in q_xyzw[i])
                + "\n"
            )


def knots_from_tum(path: str):
    """Build SplineKnots from a TUM knot file, inferring t0/dt from the first
    two stamps (reference Spline.h:43-87 semantics: first knot's stamp is
    consumed before dt is known, so t0 = second stamp)."""
    import jax.numpy as jnp

    from ..core.spline import make_knots

    times, t, q = load_tum_trajectory(path)
    if len(times) < 2:
        raise ValueError(f"{path}: need at least 2 knots")
    dt = times[1] - times[0]
    t0 = times[1]
    return make_knots(jnp.asarray(t), jnp.asarray(q), t0, dt)


# ------------------------------------------------------------------------- PLY


def save_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None):
    """ASCII PLY point cloud (reference InputOutput.cpp:43-68)."""
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]} {points[i, 1]} {points[i, 2]}"
            if colors is not None:
                row += f" {int(colors[i, 0])} {int(colors[i, 1])} {int(colors[i, 2])}"
            f.write(row + "\n")


# ----------------------------------------------------- unreal ground-truth logs


def load_unreal_gt_poses(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unreal ground-truth nav-state file: 'time x y z qx qy qz qw ...' rows
    (reference InputOutput.cpp:71-118 load_unreal_gt_data).
    Returns (times, t [N,3], q_xyzw [N,4])."""
    return load_tum_trajectory(path)


def load_imu_log(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """IMU log rows 'time ax ay az gx gy gz'
    (reference InputOutput.cpp:120-150). Returns (times, acc, gyro)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = [float(x) for x in line.split()]
            if len(parts) >= 7:
                rows.append(parts[:7])
    arr = np.asarray(rows, dtype=np.float64)
    return arr[:, 0], arr[:, 1:4], arr[:, 4:7]

"""Visualization: keypoint overlays, blur-kernel line segments, jet colormap.

Headless re-design of the reference's OpenCV GUI helpers (ImShow.h,
ColorMapJet.h, ScalarToColorMap.h:13-26, drawCurrFrameKeypoints
blur_aware_direct_tracker.cpp:436-491): renders RGB numpy images / PNG files
instead of cv::imshow windows, so it runs on headless TPU hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def jet_color(v: float) -> np.ndarray:
    """Scalar in [0,1] -> RGB jet color (reference ColorMapJet lookup,
    computed instead of a 256-entry table)."""
    v = float(np.clip(v, 0.0, 1.0))
    four = 4.0 * v
    r = np.clip(min(four - 1.5, -four + 4.5), 0.0, 1.0)
    g = np.clip(min(four - 0.5, -four + 3.5), 0.0, 1.0)
    b = np.clip(min(four + 0.5, -four + 2.5), 0.0, 1.0)
    return np.array([r, g, b])


def scalar_to_color(value: float, vmin: float, vmax: float) -> np.ndarray:
    """Reference ScalarToColorMap.h:13-26."""
    if vmax <= vmin:
        return jet_color(0.0)
    return jet_color((value - vmin) / (vmax - vmin))


def to_rgb(gray: np.ndarray) -> np.ndarray:
    g = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def draw_points(
    img_rgb: np.ndarray,
    points: np.ndarray,
    color=(0, 255, 0),
    radius: int = 1,
) -> np.ndarray:
    """Draw filled squares at point locations (in-place on a copy)."""
    out = img_rgb.copy()
    H, W = out.shape[:2]
    for x, y in np.asarray(points).reshape(-1, 2):
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < W and 0 <= yi < H:
            y0, y1 = max(0, yi - radius), min(H, yi + radius + 1)
            x0, x1 = max(0, xi - radius), min(W, xi + radius + 1)
            out[y0:y1, x0:x1] = color
    return out


def draw_segments(
    img_rgb: np.ndarray,
    segments: Sequence[np.ndarray],
    color=(255, 0, 0),
) -> np.ndarray:
    """Draw polylines (e.g. estimated blur kernels: the keypoint's projected
    path across the exposure — reference drawCurrFrameKeypoints)."""
    out = img_rgb.copy()
    H, W = out.shape[:2]
    for seg in segments:
        seg = np.asarray(seg).reshape(-1, 2)
        for a, b in zip(seg[:-1], seg[1:]):
            n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1])) * 2 + 2)
            xs = np.linspace(a[0], b[0], n)
            ys = np.linspace(a[1], b[1], n)
            for x, y in zip(xs, ys):
                xi, yi = int(round(x)), int(round(y))
                if 0 <= xi < W and 0 <= yi < H:
                    out[yi, xi] = color
    return out


def blur_kernel_segments(knots, kp_xy, kp_z, K, cap_time, exp_time, degree,
                         num_samples: int = 3):
    """Project each keypoint through poses across the exposure -> polylines
    (reference drawCurrFrameKeypoints, blur_aware_direct_tracker.cpp:436-491)."""
    import jax.numpy as jnp

    from ..core.lie import quat_conjugate, quat_rotate
    from ..core.spline import spline_pose_at

    times = np.linspace(cap_time - 0.5 * exp_time, cap_time + 0.5 * exp_time,
                        num_samples)
    P3d = np.stack(
        [
            np.asarray(kp_z) * (np.asarray(kp_xy)[:, 0] - K[2]) / K[0],
            np.asarray(kp_z) * (np.asarray(kp_xy)[:, 1] - K[3]) / K[1],
            np.asarray(kp_z),
        ],
        axis=-1,
    )
    segs = [[] for _ in range(len(P3d))]
    for tt in times:
        p = spline_pose_at(knots, float(tt), degree)
        qi = quat_conjugate(p.q)
        Pc = np.asarray(quat_rotate(qi[None], jnp.asarray(P3d) - p.t[None]))
        xy = np.stack(
            [Pc[:, 0] / Pc[:, 2] * K[0] + K[2], Pc[:, 1] / Pc[:, 2] * K[1] + K[3]],
            axis=-1,
        )
        for i in range(len(P3d)):
            segs[i].append(xy[i])
    return [np.asarray(s) for s in segs]


def save_png(path: str, img_rgb: np.ndarray) -> None:
    from PIL import Image as PILImage

    PILImage.fromarray(img_rgb.astype(np.uint8)).save(path)

"""Sparse landmark map as dense fixed-shape arrays.

TPU re-design of the reference's pointer-based scaffolding (MapSparse:
id->Point3dStatic map; Point3dStatic carries per-frame observation lists,
Point3dStatic.h:19-33). Here the sliding window's whole observation structure
is three dense tensors so the BA problem jits:

    points   [M, 3]      landmark positions (world)
    obs_xy   [W, M, 2]   pixel observation of landmark m in window frame w
    obs_mask [W, M]      1.0 where frame w actually observes landmark m

plus a landmark validity mask [M] (padding slots and culled points are 0).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class SlidingWindowMap(NamedTuple):
    points: jnp.ndarray      # [M, 3]
    point_mask: jnp.ndarray  # [M]
    obs_xy: jnp.ndarray      # [W, M, 2]
    obs_mask: jnp.ndarray    # [W, M]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def window_size(self) -> int:
        return self.obs_xy.shape[0]


def make_map(points, obs_xy, obs_mask, point_mask=None) -> SlidingWindowMap:
    points = jnp.asarray(points)
    if point_mask is None:
        point_mask = jnp.ones(points.shape[0], points.dtype)
    return SlidingWindowMap(
        points=points,
        point_mask=jnp.asarray(point_mask, points.dtype),
        obs_xy=jnp.asarray(obs_xy, points.dtype),
        obs_mask=jnp.asarray(obs_mask, points.dtype),
    )


def pad_map(m: SlidingWindowMap, num_points: int) -> SlidingWindowMap:
    """Pad the landmark axis to a static size with masked slots."""
    cur = m.num_points
    if cur >= num_points:
        return m
    pad = num_points - cur
    W = m.window_size
    return SlidingWindowMap(
        points=jnp.concatenate(
            [m.points, jnp.ones((pad, 3), m.points.dtype)], axis=0
        ),
        point_mask=jnp.concatenate(
            [m.point_mask, jnp.zeros((pad,), m.point_mask.dtype)]
        ),
        obs_xy=jnp.concatenate(
            [m.obs_xy, jnp.zeros((W, pad, 2), m.obs_xy.dtype)], axis=1
        ),
        obs_mask=jnp.concatenate(
            [m.obs_mask, jnp.zeros((W, pad), m.obs_mask.dtype)], axis=1
        ),
    )

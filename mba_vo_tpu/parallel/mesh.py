"""Mesh construction and keypoint sharding helpers.

Keypoints are the natural data-parallel axis of the tracker: each chip owns a
slice of the keypoint set (padded with masked slots to equalize shards —
SURVEY.md §7 phase 6 "pad + mask"), images/spline are replicated, and
normal equations assemble via psum.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.residual import TrackingLevelData

KP_AXIS = "kp"


def make_mesh(n_devices: Optional[int] = None, axis: str = KP_AXIS) -> Mesh:
    """1-D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_keypoints(
    data: TrackingLevelData, multiple: int
) -> TrackingLevelData:
    """Pad the keypoint axis to a multiple of the shard count with masked
    slots (mask 0 keypoints contribute nothing anywhere downstream)."""
    n = data.kp_xy.shape[0]
    n_pad = (-n) % multiple
    if n_pad == 0:
        return data
    zpad = lambda a, d: jnp.concatenate(
        [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)], axis=0
    )
    return data._replace(
        kp_xy=zpad(data.kp_xy, 0),
        kp_z=jnp.concatenate(
            [data.kp_z, jnp.ones((n_pad,), data.kp_z.dtype)]
        ),  # depth 1, masked anyway (avoid div-by-zero paths)
        kp_mask=jnp.concatenate(
            [data.kp_mask, jnp.zeros((n_pad,), data.kp_mask.dtype)]
        ),
    )


def level_data_specs() -> TrackingLevelData:
    """PartitionSpecs for TrackingLevelData under keypoint sharding:
    keypoint-indexed arrays shard over KP_AXIS, everything else replicates."""
    return TrackingLevelData(
        img_ref=P(),
        grad_ref=P(),
        cur_imgs=P(),
        cap_times=P(),
        exp_times=P(),
        kp_xy=P(KP_AXIS),
        kp_z=P(KP_AXIS),
        kp_mask=P(KP_AXIS),
        pattern=P(),
        K=P(),
    )


def shard_level_data(
    data: TrackingLevelData, mesh: Mesh
) -> TrackingLevelData:
    """Pad and device_put the level data with keypoint sharding.

    Works for 1-D meshes (keypoints over the single axis) and N-D pod
    meshes (keypoints over the flattened axes, host-major)."""
    data = pad_keypoints(data, mesh.devices.size)
    kp_spec = P(tuple(mesh.axis_names))
    specs = level_data_specs()._replace(
        kp_xy=kp_spec, kp_z=kp_spec, kp_mask=kp_spec
    )
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), data, specs
    )

"""Frontoparallel-plane inverse warping — the tracker's measurement model.

Reference: compute_pixel_intensity.h:91-153 (the CUDA device function at the
heart of the hot kernel). Given a pixel in the *current* (blurred) view, a
virtual camera pose T_c2r (current -> reference/keyframe), and the keypoint's
frontoparallel plane depth D in the reference view:

  1. back-project the pixel to a unit ray r̂;
  2. the 3D point lies where the rotated ray meets the plane z = D in the
     reference frame: scale s = (D - t_z) / (R r̂)_z;
  3. transform P = R (s r̂) + t into the reference view (P_z == D exactly);
  4. project and bilinearly sample the sharp keyframe.

Everything is batched and differentiable; Jacobians w.r.t. the pose come from
autodiff through this chain + the Lucas-Kanade sampler (ops.image.sample_lk),
replacing the reference's 60-line hand-derived 1x7 Jacobian
(compute_pixel_intensity.h:155-207).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.lie import quat_rotate
from .image import sample_lk


def unit_ray(xy: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Unit-norm back-projection ray of pixel(s) xy under pinhole K=[fx,fy,cx,cy]
    (reference compute_pixel_intensity.h:117-121)."""
    x_hat = (xy[..., 0] - K[2]) / K[0]
    y_hat = (xy[..., 1] - K[3]) / K[1]
    z_hat = 1.0 / jnp.sqrt(1.0 + x_hat * x_hat + y_hat * y_hat)
    return jnp.stack([x_hat * z_hat, y_hat * z_hat, z_hat], axis=-1)


def frontoparallel_warp(
    pose_t: jnp.ndarray,
    pose_q: jnp.ndarray,
    plane_depth: jnp.ndarray,
    K: jnp.ndarray,
    xy: jnp.ndarray,
) -> jnp.ndarray:
    """Warp current-view pixel(s) into the reference view via the plane z=D.

    pose_t [...,3], pose_q [...,4]: T_c2r (current -> reference).
    plane_depth [...]: keypoint depth in the reference view.
    xy [..., 2]: current-view pixel positions.
    Returns reference-view pixel positions [..., 2].

    Reference compute_pixel_intensity.h:116-144 (including its 1e-8
    z-division guard).
    """
    ray = unit_ray(xy, K)
    rotated = quat_rotate(pose_q, ray)
    lam = rotated[..., 2]
    s = (plane_depth - pose_t[..., 2]) / lam
    P = rotated * s[..., None] + pose_t
    iz = 1.0 / (P[..., 2] + 1e-8)
    return jnp.stack(
        [K[0] * P[..., 0] * iz + K[2], K[1] * P[..., 1] * iz + K[3]], axis=-1
    )


def warp_and_sample(
    img_ref: jnp.ndarray,
    grad_ref: jnp.ndarray,
    pose_t: jnp.ndarray,
    pose_q: jnp.ndarray,
    plane_depth: jnp.ndarray,
    K: jnp.ndarray,
    xy: jnp.ndarray,
) -> jnp.ndarray:
    """Warp + Lucas-Kanade sample: the per-(pixel, virtual pose) intensity.

    Out-of-bounds warps contribute intensity 0 with zero gradient — the
    reference's failed-sample convention
    (compute_hessian_gradients_cost.cu:93-110).
    """
    ref_xy = frontoparallel_warp(pose_t, pose_q, plane_depth, K, xy)
    return sample_lk(img_ref, grad_ref, ref_xy)

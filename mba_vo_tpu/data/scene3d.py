"""Non-planar synthetic scenes: exact ray-cast rendering + depth maps.

The reference's synthetic generator warps a single frontoparallel plane
(generate_synthetic_data.cpp:127-180) — the one geometry where the tracker's
inverse warp (compute_pixel_intensity.h:26-72 semantics) is exact by
construction, so planar tests cannot expose depth-model error. This module
renders scenes with REAL depth variation — a slanted textured plane plus a
field of textured spheres — by exact per-pixel ray casting, so that:

  * the rendered blurred sequence is an exact forward model from ANY pose
    (no iterative inverse-warp approximation, no splatting holes);
  * the per-view z-depth map is exact, matching the dataset contract the
    tracker expects (blur_aware_direct_tracker.cpp:373-386: ground-truth
    depth per keyframe);
  * tracking accuracy on these scenes measures the cost of the tracker's
    LOCAL frontoparallel-patch assumption on non-planar geometry — the
    readiness gate for BASELINE config 3 (real motion-blur sequences).

Everything is jnp and vectorized over the pixel grid: rays are intersected
with all primitives at once and the nearest hit wins (masked select, no
branching) — TPU-idiomatic raycasting.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lie import quat_rotate
from ..core.spline import SplineKnots, spline_pose_at, virtual_pose_times
from ..ops.image import bilinear_sample


class Scene3D(NamedTuple):
    """Slanted textured plane + spheres, all in the world (= keyframe
    camera at identity) frame.

    plane_point:  [3] a point on the background plane
    plane_normal: [3] unit normal (pointing toward the camera, -z-ish)
    plane_axes:   [2, 3] orthonormal in-plane texture axes (u, v)
    texture:      [Ht, Wt] the plane's albedo image
    texture_scale: pixels of texture per meter of plane
    sphere_c:     [M, 3] sphere centers
    sphere_r:     [M] radii
    sphere_phase: [M] texture phase offsets (decorrelates the procedural
                  albedo between spheres)
    """

    plane_point: jnp.ndarray
    plane_normal: jnp.ndarray
    plane_axes: jnp.ndarray
    texture: jnp.ndarray
    texture_scale: jnp.ndarray
    sphere_c: jnp.ndarray
    sphere_r: jnp.ndarray
    sphere_phase: jnp.ndarray


def default_scene(texture: np.ndarray, depth: float = 2.0,
                  tilt_deg: float = 18.0, num_spheres: int = 5,
                  seed: int = 7, dtype=jnp.float32) -> Scene3D:
    """Standard non-planar test scene.

    A plane at mean distance ``depth`` tilted ``tilt_deg`` about the y axis
    (left edge nearer than the right), carrying ``texture``; ``num_spheres``
    textured spheres float between the camera and the plane at varied
    depths. Depth across a VGA view spans roughly [0.55, 1.25] x depth.
    """
    t = np.deg2rad(tilt_deg)
    normal = np.array([np.sin(t), 0.0, -np.cos(t)])
    u = np.array([np.cos(t), 0.0, np.sin(t)])     # in-plane, unit
    v = np.array([0.0, 1.0, 0.0])
    rng = np.random.default_rng(seed)
    c = np.stack(
        [
            rng.uniform(-0.45, 0.45, num_spheres) * depth,
            rng.uniform(-0.33, 0.33, num_spheres) * depth,
            rng.uniform(0.55, 0.9, num_spheres) * depth,
        ],
        axis=-1,
    )
    r = rng.uniform(0.06, 0.13, num_spheres) * depth
    ph = rng.uniform(0, 2 * np.pi, num_spheres)
    return Scene3D(
        plane_point=jnp.asarray([0.0, 0.0, depth], dtype),
        plane_normal=jnp.asarray(normal, dtype),
        plane_axes=jnp.asarray(np.stack([u, v]), dtype),
        texture=jnp.asarray(texture, dtype),
        texture_scale=jnp.asarray(
            texture.shape[1] / (2.2 * depth), dtype),
        sphere_c=jnp.asarray(c, dtype),
        sphere_r=jnp.asarray(r, dtype),
        sphere_phase=jnp.asarray(ph, dtype),
    )


def _sphere_albedo(scene: Scene3D, X: jnp.ndarray, m: int) -> jnp.ndarray:
    """Smooth procedural albedo on sphere m at world points X [..., 3] —
    band-limited (photometric optimization needs non-cliff texture)."""
    ph = scene.sphere_phase[m]
    k = 26.0 / jnp.maximum(scene.sphere_r[m], 1e-6)
    s = (
        jnp.sin(k * X[..., 0] + ph)
        + jnp.sin(k * 0.8 * X[..., 1] + 2.1 * ph)
        + jnp.sin(k * 1.3 * X[..., 2] + 0.5 * ph)
    )
    return 128.0 + 40.0 * s


def render_scene(
    scene: Scene3D,
    pose_t: jnp.ndarray,
    pose_q: jnp.ndarray,
    K: jnp.ndarray,
    H: int,
    W: int,
):
    """(image [H, W], zdepth [H, W]) seen from camera pose T_c2w.

    Rays: for pixel (x, y), camera-frame direction d_cam = ((x-cx)/fx,
    (y-cy)/fy, 1); with this normalization the ray parameter IS the
    camera-frame z-depth, exactly the quantity the tracker's depth contract
    uses (utils Geometry.cpp:11-36 converts the reference's ray depth to
    this z form).
    """
    dtype = scene.texture.dtype
    ys, xs = jnp.mgrid[0:H, 0:W]
    d_cam = jnp.stack(
        [
            (xs.astype(dtype) - K[2]) / K[0],
            (ys.astype(dtype) - K[3]) / K[1],
            jnp.ones((H, W), dtype),
        ],
        axis=-1,
    )                                                   # [H, W, 3]
    o = pose_t                                          # camera center, world
    d = quat_rotate(pose_q[None, None, :], d_cam)       # [H, W, 3] world

    big = jnp.asarray(1e9, dtype)

    # ---- plane hit
    n = scene.plane_normal
    denom = jnp.einsum("hwc,c->hw", d, n)
    t_pl = jnp.einsum("c,c->", scene.plane_point - o, n) / jnp.where(
        jnp.abs(denom) < 1e-9, jnp.asarray(1e-9, dtype), denom
    )
    t_pl = jnp.where((t_pl > 1e-4) & (jnp.abs(denom) >= 1e-9), t_pl, big)
    X_pl = o + t_pl[..., None] * d
    uv = jnp.einsum("hwc,ac->hwa", X_pl - scene.plane_point,
                    scene.plane_axes) * scene.texture_scale
    Ht, Wt = scene.texture.shape
    tex_xy = jnp.stack(
        [uv[..., 0] + (Wt - 1) / 2.0, uv[..., 1] + (Ht - 1) / 2.0], axis=-1
    )
    # tile the texture by reflection so the plane never runs out of albedo
    period_x, period_y = 2.0 * (Wt - 1), 2.0 * (Ht - 1)
    mx = jnp.mod(tex_xy[..., 0], period_x)
    my = jnp.mod(tex_xy[..., 1], period_y)
    mx = jnp.where(mx > Wt - 1, period_x - mx, mx)
    my = jnp.where(my > Ht - 1, period_y - my, my)
    col_pl = bilinear_sample(
        scene.texture, jnp.stack([mx, my], -1).reshape(-1, 2)
    ).reshape(H, W)

    # ---- nearest sphere hit (masked select over all spheres)
    t_best = t_pl
    col_best = col_pl
    M = scene.sphere_c.shape[0]
    dd = jnp.einsum("hwc,hwc->hw", d, d)
    for m in range(M):
        oc = o - scene.sphere_c[m]
        b = jnp.einsum("hwc,c->hw", d, oc)
        cterm = jnp.einsum("c,c->", oc, oc) - scene.sphere_r[m] ** 2
        disc = b * b - dd * cterm
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_m = (-b - sq) / dd
        t_m = jnp.where((disc > 0) & (t_m > 1e-4), t_m, big)
        X_m = o + t_m[..., None] * d
        col_m = _sphere_albedo(scene, X_m, m)
        closer = t_m < t_best
        col_best = jnp.where(closer, col_m, col_best)
        t_best = jnp.where(closer, t_m, t_best)

    z = jnp.where(t_best >= big, jnp.zeros_like(t_best), t_best)
    return col_best, z


def apply_photometric_disturbance(
    img: jnp.ndarray, gain: float = 1.0, bias: float = 0.0,
    vignette: float = 0.0,
) -> jnp.ndarray:
    """Camera-realism rung: per-frame gain/bias plus radial vignetting
    ``(gain*img + bias) * (1 - vignette * (r/r_corner)^2)`` — the
    photometric disturbance real blurred sequences carry and the
    reference's pure-intensity model cannot express
    (compute_pixel_intensity.h:26-72). Counterpart:
    TrackerConfig.affine_brightness."""
    Himg, Wimg = img.shape
    dtype = img.dtype
    ys, xs = jnp.mgrid[0:Himg, 0:Wimg]
    cy, cx = (Himg - 1) / 2.0, (Wimg - 1) / 2.0
    r2 = (((xs.astype(dtype) - cx) / cx) ** 2
          + ((ys.astype(dtype) - cy) / cy) ** 2) / 2.0   # 1.0 at corners
    return (gain * img + bias) * (1.0 - vignette * r2)


def degrade_depth(
    z: np.ndarray, quantize: float = 5000.0, noise_sigma: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Sensor-realism rung for keyframe depth: eth3d PNG16 quantization
    (round(z * 5000) / 5000 — the dataset contract of
    blur_aware_direct_tracker.cpp:373-386) plus optional Gaussian depth
    noise."""
    z = np.asarray(z)
    zq = np.round(z * quantize) / quantize
    if noise_sigma > 0:
        zq = zq + np.random.default_rng(seed).normal(0, noise_sigma, z.shape)
    return zq.astype(z.dtype)


def with_occluder(scene: Scene3D, center, radius: float) -> Scene3D:
    """Occlusion-realism rung: append one (per-frame movable) foreground
    sphere — patches it covers violate both the depth map and the
    photometric model, exercising Huber + chi-square outlier rejection."""
    dtype = scene.sphere_r.dtype
    return scene._replace(
        sphere_c=jnp.concatenate(
            [scene.sphere_c, jnp.asarray([center], dtype)], axis=0),
        sphere_r=jnp.concatenate(
            [scene.sphere_r, jnp.asarray([radius], dtype)]),
        sphere_phase=jnp.concatenate(
            [scene.sphere_phase, jnp.asarray([1.7], dtype)]),
    )


def scene_depth_map(scene: Scene3D, pose_t, pose_q, K, H: int, W: int):
    """Exact z-depth map from a pose (the keyframe ground-truth depth the
    dataset contract feeds the tracker)."""
    _, z = render_scene(scene, pose_t, pose_q, K, H, W)
    return z


def synthesize_blurred_image_scene(
    scene: Scene3D,
    knots: SplineKnots,
    degree: int,
    capture_time: float,
    exposure_time: float,
    num_samples: int,
    K: jnp.ndarray,
    H: int,
    W: int,
) -> jnp.ndarray:
    """Average of exact scene renders at spline poses across the exposure —
    the non-planar forward model (reference
    generate_synthetic_data.cpp:152-180, with real geometry instead of the
    plane; the tracker still inverts it with local frontoparallel patches,
    which is exactly the model error this benchmark measures)."""
    times = virtual_pose_times(
        jnp.asarray(capture_time, scene.texture.dtype), exposure_time,
        num_samples,
    )

    def render(tt):
        p = spline_pose_at(knots, tt, degree)
        img, _ = render_scene(scene, p.t, p.q, K, H, W)
        return img

    acc = jax.vmap(render)(times)
    return acc.mean(axis=0)

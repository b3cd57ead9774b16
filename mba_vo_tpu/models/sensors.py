"""Multi-sensor system: camera/IMU registry with extrinsics and per-camera
frame containers.

Parity with the reference's sensor layer
(/root/reference/src/core/sensors/NSensorSystem.h:1-52: id->camera and
id->IMU maps, paired-camera registry, name->id lookup;
/root/reference/src/core/sensors/SensorBase.{h,cpp}: per-sensor body->sensor
extrinsics; /root/reference/src/core/measurements/Frame.h:19-97: per-CAMERA
maps of image/pyramid/gradient pyramids with detection dispatch).

TPU-first shape: the registry is host-side bookkeeping (plain dataclasses —
sensors are configuration, not compute); everything a device kernel touches
(intrinsics vector, extrinsic pose) is a jnp array, so a camera handed to
the tracker pipeline jits without conversion.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..core.lie import quat_conjugate, quat_multiply, quat_rotate
from ..core.transform import Pose, pose_identity
from .trajectory import ImuParams


@dataclasses.dataclass
class CameraEntry:
    """One registered camera: model + body->camera extrinsics.

    camera: any of models.camera's pytree cameras (PinholeCamera /
        UnifiedCamera) or a raw [4] intrinsics vector for the direct
        tracker path.
    T_b2s: body-to-sensor extrinsic pose (reference SensorBase's
        m_T_body2sensor).
    """

    camera: object
    T_b2s: Pose
    name: Optional[str] = None


@dataclasses.dataclass
class ImuEntry:
    params: ImuParams
    T_b2s: Pose
    name: Optional[str] = None


class SensorSystem:
    """id -> camera / IMU registry with paired cameras and name lookup
    (reference NSensorSystem.h:25-47)."""

    def __init__(self):
        self._cameras: Dict[int, CameraEntry] = {}
        self._imus: Dict[int, ImuEntry] = {}
        self._paired: Dict[int, int] = {}
        self._name_to_id: Dict[str, int] = {}

    # ----------------------------------------------------------- registration

    def add_camera(self, dev_id: int, camera, T_b2s: Optional[Pose] = None,
                   name: Optional[str] = None) -> None:
        if dev_id in self._cameras:
            raise ValueError(f"camera id {dev_id} already registered")
        entry = CameraEntry(
            camera=camera,
            T_b2s=T_b2s if T_b2s is not None else pose_identity(jnp.float32),
            name=name,
        )
        self._cameras[dev_id] = entry
        if name is not None:
            self._name_to_id[name] = dev_id

    def add_paired_camera(self, ref_cam_id: int, overlapped_cam_id: int) -> None:
        """Register a stereo/overlap pairing (reference NSensorSystem.h:28)."""
        for cid in (ref_cam_id, overlapped_cam_id):
            if cid not in self._cameras:
                raise ValueError(f"camera id {cid} not registered")
        self._paired[ref_cam_id] = overlapped_cam_id

    def add_imu(self, dev_id: int, params: ImuParams,
                T_b2s: Optional[Pose] = None,
                name: Optional[str] = None) -> None:
        if dev_id in self._imus:
            raise ValueError(f"imu id {dev_id} already registered")
        self._imus[dev_id] = ImuEntry(
            params=params,
            T_b2s=T_b2s if T_b2s is not None else pose_identity(jnp.float32),
            name=name,
        )
        if name is not None:
            self._name_to_id[name] = dev_id

    # ---------------------------------------------------------------- lookup

    def get_camera(self, dev_id: int) -> CameraEntry:
        return self._cameras[dev_id]

    def get_cameras(self) -> Dict[int, CameraEntry]:
        return dict(self._cameras)

    def get_paired_cameras(self) -> Dict[int, int]:
        return dict(self._paired)

    def get_imu(self, dev_id: int) -> ImuEntry:
        return self._imus[dev_id]

    def get_dev_id(self, name: str) -> int:
        """Name -> id lookup (reference NSensorSystem.h:37 get_devId)."""
        return self._name_to_id[name]

    # -------------------------------------------------------------- geometry

    def relative_extrinsics(self, cam_a: int, cam_b: int) -> Pose:
        """T_a2b: points in camera a's frame expressed in camera b's frame
        (composition of the two body->sensor extrinsics)."""
        Ta = self._cameras[cam_a].T_b2s   # body -> a
        Tb = self._cameras[cam_b].T_b2s   # body -> b
        # T_a2b = T_b2s(b) * T_b2s(a)^-1
        qa_inv = quat_conjugate(Ta.q)
        t_ainv = -quat_rotate(qa_inv, Ta.t)
        q = quat_multiply(Tb.q, qa_inv)
        t = quat_rotate(Tb.q, t_ainv) + Tb.t
        return Pose(t=t, q=q)


class MultiCameraFrame:
    """Per-camera measurement container for one timestamp (reference
    Frame.h:72-95: per-camera image / pyramid / gradient-pyramid maps plus
    capture and exposure times; pyramids and gradients computed lazily via
    the jitted ops the single-camera tracker already uses)."""

    def __init__(self, cap_time: float, exp_time: float):
        self.cap_time = cap_time
        self.exp_time = exp_time
        self._images: Dict[int, jnp.ndarray] = {}
        self._pyramids: Dict[int, List[jnp.ndarray]] = {}
        self._grad_pyramids: Dict[int, List[jnp.ndarray]] = {}

    def add_image(self, cam_id: int, img: jnp.ndarray) -> None:
        self._images[cam_id] = jnp.asarray(img)

    def camera_ids(self) -> List[int]:
        return sorted(self._images)

    def image(self, cam_id: int) -> jnp.ndarray:
        return self._images[cam_id]

    def compute_pyramid(self, cam_id: int, num_levels: int):
        """Reference Frame.cpp:117-134 computeImagePyramid, per camera."""
        from ..ops.image import image_pyramid

        self._pyramids[cam_id] = image_pyramid(self._images[cam_id],
                                               num_levels)
        return self._pyramids[cam_id]

    def compute_grad_pyramid(self, cam_id: int):
        """Reference Frame.cpp:136-152 computeGradImagePyramid."""
        from ..ops.image import image_gradients

        pyr = self._pyramids.get(cam_id)
        if pyr is None:
            raise ValueError("compute_pyramid first")
        self._grad_pyramids[cam_id] = [image_gradients(lv) for lv in pyr]
        return self._grad_pyramids[cam_id]

    def pyramid(self, cam_id: int):
        return self._pyramids[cam_id]

    def grad_pyramid(self, cam_id: int):
        return self._grad_pyramids[cam_id]

    def detect_features(self, cam_id: int, level: int, opts):
        """Per-camera semi-dense detection dispatch (reference
        Frame.cpp:154-187)."""
        from ..ops.image import gradient_magnitude
        from ..tracker.detector import detect_semidense_jit

        grads = self._grad_pyramids[cam_id]
        mag = gradient_magnitude(grads[level])
        return detect_semidense_jit(mag, level, opts)

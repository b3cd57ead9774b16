"""mba_vo_tpu — a TPU-native motion-blur-aware visual odometry / SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ethliup/MBA-VO
(ICCV 2021 "MBA-VO: Motion Blur Aware Visual Odometry"). The blur-aware
photometric tracker models each blurred frame as the temporal average of
virtual sharp images synthesized along a continuous SE(3) B-spline trajectory
inside the exposure window; tracking is a Levenberg-Marquardt solve over the
spline control knots, coarse-to-fine over an image pyramid, with the entire
residual/Jacobian/Hessian evaluation and the LM iteration running on-device
inside a single jit.

Package layout
--------------
core/     Lie-group math (quaternions, SO(3)/SE(3) log/exp) and SE(3)
          B-spline interpolation — the device-portable math layer
          (reference: src/core/common/).
models/   Camera models (pinhole, unified, radial-tangential distortion) and
          spline trajectory models with IMU derivatives
          (reference: src/core/sensors/, src/utils/SplineTrajectory.h).
ops/      Image ops (pyramid, gradients, custom-JVP bilinear sampling),
          frontoparallel warping, and the blur-aware residual/Hessian
          pipeline with a gather-free MXU windowed-sampling backend
          (reference: src/ba_tracker/cuda kernels, src/core/image_proc/).
solver/   Trust-region Levenberg-Marquardt as a lax.while_loop, normal
          equation solvers (reference: src/ba_tracker/ LM machinery).
tracker/  The blur-aware direct tracker: keyframe logic, feature detection,
          constant-velocity initialization, coarse-to-fine schedule
          (reference: src/ba_tracker/blur_aware_direct_tracker.cpp).
backend/  Sliding-window bundle adjustment with Schur-complement landmark
          elimination and pose-graph optimization (new capability; reference
          only has scaffolding in src/core/states/MapSparse.*).
parallel/ Device-mesh sharding of keypoints/keyframes and psum-assembled
          normal equations for multi-chip / multi-host operation (new).
data/     Synthetic blur oracle, dataset loaders (unreal / eth3d formats),
          trajectory I/O (reference: src/utils/InputOutput.*,
          src/ba_tracker/generate_synthetic_data.cpp).
utils/    Typed configs, profiling, checkpointing, visualization.
"""

__version__ = "0.1.0"

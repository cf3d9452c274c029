"""vslam_tpu — a TPU-native visual SLAM framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capability set of the reference C++ pipeline
`salah-dev-stu/visual-slam-pipeline` (monocular / RGB-D SLAM on TUM RGB-D),
re-designed for TPU hardware:

- SuperPoint / MiDaS forward passes as jitted JAX models (``vslam_tpu.models``)
  with Pallas kernels for channel-softmax keypoint decoding, NMS and bilinear
  descriptor sampling (``vslam_tpu.ops.nms``).
- Descriptor matching and local-map tracking as batched MXU matmuls
  (``vslam_tpu.ops.matching``), replacing FLANN KNN and grid search.
- RANSAC solvers (3D-3D Kabsch, Essential/Fundamental 8-point, DLT-PnP) as
  vmapped hypothesis batches (``vslam_tpu.ops.ransac``), replacing OpenCV
  calib3d.
- EKF + RTS smoothing as `lax.scan` kernels (``vslam_tpu.ops.ekf``).
- Schur-complement LM bundle adjustment and SE3 pose-graph optimization
  (``vslam_tpu.ops.ba``, ``vslam_tpu.ops.pgo``), replacing g2o.
- Fixed-capacity masked-array map store and a functional tracking state
  machine scanned over the frame stream (``vslam_tpu.core``).
- Grid-hash voxel dedup and fixed-radius neighbor ops for dense mapping
  (``vslam_tpu.ops.gridhash``, ``vslam_tpu.ops.pointcloud``), replacing
  nanoflann KD-trees.
- Multi-sequence data parallelism over a `jax.sharding.Mesh`
  (``vslam_tpu.parallel``).

See SURVEY.md for the structural analysis of the reference this build tracks.
"""

__version__ = "0.1.0"

from vslam_tpu.config import SlamConfig  # noqa: F401

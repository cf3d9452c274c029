"""Geometry / estimation kernels (pure JAX + Pallas), all batch-first.

Replaces the reference's OpenCV calib3d, g2o and nanoflann dependencies with
from-scratch TPU-native implementations (see SURVEY.md §2 "Native components").
"""

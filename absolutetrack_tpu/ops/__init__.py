"""Compute ops: warp/resample, Procrustes, FTL. XLA-first, Pallas where it pays."""

from .resample import bilinear_sample, warp_perspective_crop, warp_homography
from .procrustes import procrustes_align

__all__ = [
    "bilinear_sample",
    "procrustes_align",
    "warp_homography",
    "warp_perspective_crop",
]

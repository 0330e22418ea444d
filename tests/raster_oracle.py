"""Numpy scanline z-buffer oracle, mirroring the reference CUDA kernel.

A direct, loop-based re-implementation of the semantics in
``mesh/cuda_kernel/depth_rasterization_cuda_kernel.cu:18-113`` (back-face
cull, x-sort with the kernel's tie rules, scanline spans with C integer
truncation, clamped renormalized barycentrics, perspective-correct 1/z,
float min z-test). Used purely as the correctness reference for the XLA /
Pallas rasterizers; never imported by the library.
"""
from __future__ import annotations

import math

import numpy as np


def rasterize_oracle(face_vertices: np.ndarray, width: int, height: int) -> np.ndarray:
    """face_vertices: (B, F, 3, 3) float32. Returns (B, height, width) f32."""
    batch, num_faces = face_vertices.shape[:2]
    out = np.full((batch, height, width), 1000.0, np.float32)
    fv = face_vertices.astype(np.float32)
    for b in range(batch):
        for f in range(num_faces):
            v = fv[b, f]  # (3, 3)
            x, y = v[:, 0], v[:, 1]
            # back-face cull (unsorted winding)
            if (y[2] - y[0]) * (x[1] - x[0]) < (y[1] - y[0]) * (x[2] - x[0]):
                continue
            # sort by x, kernel tie rules
            if x[0] < x[1]:
                i0 = 2 if x[2] < x[0] else 0
                i2 = 2 if x[1] < x[2] else 1
            else:
                i0 = 2 if x[2] < x[1] else 1
                i2 = 2 if x[0] < x[2] else 0
            i1 = 3 - i0 - i2
            p = v[[i0, i1, i2]].astype(np.float32)
            if p[0, 0] == p[2, 0]:
                continue
            den = (
                p[2, 0] * (p[0, 1] - p[1, 1])
                + p[0, 0] * (p[1, 1] - p[2, 1])
                + p[1, 0] * (p[2, 1] - p[0, 1])
            )
            if den == 0.0:  # deliberate deviation: skip exactly-collinear faces
                continue
            finv = (
                np.array(
                    [
                        [p[1, 1] - p[2, 1], p[2, 0] - p[1, 0], p[1, 0] * p[2, 1] - p[2, 0] * p[1, 1]],
                        [p[2, 1] - p[0, 1], p[0, 0] - p[2, 0], p[2, 0] * p[0, 1] - p[0, 0] * p[2, 1]],
                        [p[0, 1] - p[1, 1], p[1, 0] - p[0, 0], p[0, 0] * p[1, 1] - p[1, 0] * p[0, 1]],
                    ],
                    np.float32,
                )
                / den
            )
            xi_min = int(max(math.ceil(p[0, 0]), 0.0))
            xi_max = int(min(p[2, 0], width - 1.0))  # C truncation toward zero
            for xi in range(xi_min, xi_max + 1):
                if xi <= p[1, 0]:
                    if p[1, 0] - p[0, 0] != 0.0:
                        yi1 = (p[1, 1] - p[0, 1]) / (p[1, 0] - p[0, 0]) * (xi - p[0, 0]) + p[0, 1]
                    else:
                        yi1 = p[1, 1]
                else:
                    if p[2, 0] - p[1, 0] != 0.0:
                        yi1 = (p[2, 1] - p[1, 1]) / (p[2, 0] - p[1, 0]) * (xi - p[1, 0]) + p[1, 1]
                    else:
                        yi1 = p[1, 1]
                yi2 = (p[2, 1] - p[0, 1]) / (p[2, 0] - p[0, 0]) * (xi - p[0, 0]) + p[0, 1]
                yi_min = int(max(0.0, math.ceil(min(yi1, yi2))))
                yi_max = int(min(max(yi1, yi2), height - 1.0))
                for yi in range(yi_min, yi_max + 1):
                    w = finv[:, 0] * xi + finv[:, 1] * yi + finv[:, 2]
                    w = np.clip(w, 0.0, 1.0)
                    w_sum = w.sum()
                    with np.errstate(divide="ignore", invalid="ignore"):
                        w = w / w_sum
                        zp = 1.0 / (w[0] / p[0, 2] + w[1] / p[1, 2] + w[2] / p[2, 2])
                    if not np.isnan(zp):
                        out[b, yi, xi] = min(out[b, yi, xi], zp)
    return out


def downsample_2x2_mean(img: np.ndarray, sample_pos: np.ndarray) -> np.ndarray:
    """Gather the sparse sample grid from a full canvas and 2x2-average.

    Equivalent to torch bilinear align_corners=False resize for even integer
    scale factors (see render/raster.py:bilinear_sample_positions).
    """
    idx = sample_pos.astype(np.int64)
    sub = img[:, idx][:, :, idx]  # (B, 2*out, 2*out)
    b, s = sub.shape[0], sub.shape[1] // 2
    return sub.reshape(b, s, 2, s, 2).mean(axis=(2, 4))

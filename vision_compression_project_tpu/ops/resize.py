"""Bilinear/area image resize as MXU matmuls.

A separable resize is `R_h @ img @ R_w^T` with banded interpolation matrices.
On TPU that is exactly what the MXU is for — two large batched matmuls that
XLA tiles perfectly — so this deliberately does NOT use a gather-based Pallas
kernel: dense banded matmul beats irregular gathers on this hardware, and the
interpolation matrices are built once per (in, out) size pair and cached.

Replaces the reference's Pillow-side image handling around Poppler rasters
(reference: backend/app/pipeline/pdf_extract.py:107-131) with an on-device
path: uint8 page rasters are shipped to HBM as-is (3 bytes/pixel) and
converted/resized/normalized on device, minimizing host->device bandwidth
(SURVEY.md §7 "Host→device ingest bandwidth").
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def bilinear_matrix(in_size: int, out_size: int, antialias: bool = True) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix.

    With antialias and downscale, this is a triangle (tent) filter scaled by
    the downsample ratio — i.e. 'area-like' bilinear, matching
    jax.image.resize(..., method='bilinear', antialias=True).
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    scale = in_size / out_size
    support = max(scale, 1.0) if antialias else 1.0
    out = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - support))
        hi = int(np.ceil(center + support))
        for j in range(lo, hi + 1):
            if j < 0 or j >= in_size:
                # Out-of-range taps are dropped and the row renormalized —
                # matches jax.image.resize's boundary handling.
                continue
            weight = max(0.0, 1.0 - abs(j - center) / support)
            out[i, j] += weight
        s = out[i].sum()
        if s > 0:
            out[i] /= s
    return out


def resize_bilinear(
    images: jnp.ndarray,
    out_h: int,
    out_w: int,
    antialias: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Resize (..., H, W, C) images via two MXU matmuls.

    Accepts uint8 or float input; computes in float32 (weights are exact in
    f32; inputs are 8-bit so f32 accumulation is lossless enough), returns
    `dtype`.
    """
    h, w = images.shape[-3], images.shape[-2]
    r_h = jnp.asarray(bilinear_matrix(h, out_h, antialias))
    r_w = jnp.asarray(bilinear_matrix(w, out_w, antialias))
    x = images.astype(jnp.float32)
    # (..., H, W, C): contract H with r_h then W with r_w.
    x = jnp.einsum("oh,...hwc->...owc", r_h, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("pw,...owc->...opc", r_w, x, preferred_element_type=jnp.float32)
    return x.astype(dtype)

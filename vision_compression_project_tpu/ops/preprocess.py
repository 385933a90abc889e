"""Fused page-raster preprocessing: uint8 HWC rasters -> bf16 patch tokens.

TPU-first replacement for the reference's host-side Pillow handling of
Poppler rasters (reference: backend/app/pipeline/pdf_extract.py:107-131).
Pages ship to HBM as raw uint8 (minimum PCIe bytes); everything else runs
on device in one jit:

  uint8 -> f32 convert -> separable bilinear resize (two MXU matmuls,
  ops/resize.py) -> per-channel normalize -> patchify -> bf16.

Deliberately XLA, not a hand-written Pallas kernel: the FLOPs live in the
resize matmuls (MXU), the convert/normalize are elementwise epilogues XLA
fuses into them, and patchify is a pure layout permutation the XLA layout
engine handles natively.  A Pallas version was measured and rejected: the
(p, W*C) -> (W/p, p*p*C) patch permutation requires shape casts Mosaic
cannot lower (lane-dimension regrouping), and an MXU permutation-matmul
workaround burns real FLOPs on data movement.  Pallas effort stays where it
pays: attention (ops/attention.py) and retrieval scoring (ops/topk.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .resize import resize_bilinear

# ImageNet-free default: map uint8 [0,255] -> [-1, 1].
DEFAULT_MEAN = (127.5, 127.5, 127.5)
DEFAULT_STD = (127.5, 127.5, 127.5)


@functools.partial(jax.jit, static_argnames=("patch", "mean", "std", "out_dtype"))
def patchify_normalize(
    images: jnp.ndarray,
    patch: int = 16,
    mean: Tuple[float, ...] = DEFAULT_MEAN,
    std: Tuple[float, ...] = DEFAULT_STD,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H, W, C) float/uint8 -> (B, (H//patch)*(W//patch), patch*patch*C)."""
    b, h, w, c = images.shape
    assert h % patch == 0 and w % patch == 0, (h, w, patch)
    x = images.astype(jnp.float32)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    x = x.reshape(b, h // patch, patch, w // patch, patch, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, (h // patch) * (w // patch), patch * patch * c).astype(out_dtype)


# The former Pallas kernel path; retained as an alias so callers/tests keep a
# single reference implementation to compare against.
patchify_normalize_reference = patchify_normalize


@functools.partial(
    jax.jit, static_argnames=("target_h", "target_w", "patch", "out_dtype")
)
def preprocess_pages(
    pages_u8: jnp.ndarray,
    target_h: int = 1024,
    target_w: int = 1024,
    patch: int = 16,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Full preprocessing: uint8 page rasters -> patch-token activations.

    (B, H_raw, W_raw, 3) uint8 -> (B, (target_h//patch)*(target_w//patch),
    patch*patch*3) bf16, single fused jit.

    Grayscale input — (B, H, W) or (B, H, W, 1) — is accepted and broadcast
    to RGB *after* the resize: document rasters are overwhelmingly gray, so
    shipping one channel cuts host->device bandwidth (the serving
    bottleneck) 3x with zero quality loss, and the resize matmuls run on a
    third of the pixels.
    """
    if pages_u8.ndim == 3:
        pages_u8 = pages_u8[..., None]
    resized = resize_bilinear(pages_u8, target_h, target_w, dtype=jnp.float32)
    if resized.shape[-1] == 1:
        resized = jnp.broadcast_to(
            resized, resized.shape[:-1] + (3,)
        )
    return patchify_normalize(resized, patch=patch, out_dtype=out_dtype)


def preprocess_pages_reference(
    pages_u8: jnp.ndarray,
    target_h: int = 1024,
    target_w: int = 1024,
    patch: int = 16,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    resized = resize_bilinear(pages_u8, target_h, target_w, dtype=jnp.float32)
    return patchify_normalize_reference(resized, patch=patch, out_dtype=out_dtype)

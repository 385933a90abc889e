"""Fused page-raster preprocessing: normalize + patchify (Pallas) after an
MXU-matmul resize.

TPU-first replacement for the reference's host-side Pillow handling of
Poppler rasters (reference: backend/app/pipeline/pdf_extract.py:107-131).
Pages arrive as uint8 HWC buffers from the C++ rasterizer, are shipped raw to
HBM (minimum PCIe/DCN bytes), resized on the MXU (see ops/resize.py), and the
normalize+patchify step runs as a single Pallas kernel that reads each image
row-band once from HBM and writes MXU-ready (num_patches, patch_dim) bf16
activations — no intermediate HWC float tensor ever materializes in HBM.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode
from .resize import resize_bilinear

# ImageNet-free default: map uint8 [0,255] -> [-1, 1].
DEFAULT_MEAN = (127.5, 127.5, 127.5)
DEFAULT_STD = (127.5, 127.5, 127.5)


def _norm_rows(w: int, c: int, mean: Sequence[float], std: Sequence[float]):
    """Per-column scale/bias rows of length w*c implementing (x-mean)/std."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale = np.tile(1.0 / std, w)
    bias = np.tile(-mean / std, w)
    return scale.reshape(1, w * c), bias.reshape(1, w * c)


def _patchify_kernel(x_ref, scale_ref, bias_ref, out_ref, *, patch: int, w: int, c: int):
    # x_ref: (1, patch, w*c) one band of `patch` image rows.
    x = x_ref[0].astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    # Row-major (patch, w, c): grouping the last axis as (w//patch, patch*c)
    # is contiguous, so patch extraction is one minor-preserving transpose.
    x = x.reshape(patch, w // patch, patch * c)
    x = jnp.transpose(x, (1, 0, 2)).reshape(w // patch, patch * patch * c)
    out_ref[0, 0] = x.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("patch", "mean", "std", "out_dtype")
)
def patchify_normalize(
    images: jnp.ndarray,
    patch: int = 16,
    mean: Tuple[float, ...] = DEFAULT_MEAN,
    std: Tuple[float, ...] = DEFAULT_STD,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H, W, C) float/uint8 -> (B, (H//patch)*(W//patch), patch*patch*C).

    Single-pass Pallas kernel; grid = (B, H//patch) row bands.
    """
    b, h, w, c = images.shape
    assert h % patch == 0 and w % patch == 0, (h, w, patch)
    scale, bias = _norm_rows(w, c, mean, std)
    x2 = images.reshape(b, h, w * c)
    grid = (b, h // patch)
    out = pl.pallas_call(
        functools.partial(_patchify_kernel, patch=patch, w=w, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, patch, w * c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, w * c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, w // patch, patch * patch * c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, h // patch, w // patch, patch * patch * c), out_dtype
        ),
        interpret=interpret_mode(),
    )(x2, jnp.asarray(scale), jnp.asarray(bias))
    return out.reshape(b, (h // patch) * (w // patch), patch * patch * c)


def patchify_normalize_reference(
    images: jnp.ndarray,
    patch: int = 16,
    mean: Tuple[float, ...] = DEFAULT_MEAN,
    std: Tuple[float, ...] = DEFAULT_STD,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Pure-XLA reference used to validate the Pallas kernel."""
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    x = x.reshape(b, h // patch, patch, w // patch, patch, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, (h // patch) * (w // patch), patch * patch * c).astype(out_dtype)


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
    patch*patch*3) bf16.  Resize rides the MXU; normalize+patchify is the
    fused Pallas pass.
    """
    resized = resize_bilinear(pages_u8, target_h, target_w, dtype=jnp.float32)
    # Resize outputs are already in [0,255] float; normalize in the kernel.
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

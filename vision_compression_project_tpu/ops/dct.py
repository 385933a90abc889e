"""8x8 JPEG-style DCT re-encode / decode.

Compressed at-rest representation for page rasters: instead of keeping raw
uint8 pixels (≈11.6 MB per A4@200DPI page, SURVEY.md §7) the pipeline can
keep quantized DCT coefficients (int16, mostly zero after quantization),
cutting HBM/disk footprint ~4-8x while staying losslessly invertible up to
the quantization table.  The 2D DCT of an 8x8 block is `C @ X @ C^T`; over a
whole image that is two dense matmuls per block row — exactly MXU-shaped, so
this stays in XLA einsums (the compiler tiles and fuses the quantize/round
elementwise epilogue; a hand-written Pallas kernel adds nothing here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Standard JPEG luminance quantization table (quality ~50).
JPEG_LUMA_QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)


@functools.lru_cache(maxsize=1)
def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8), np.float32)
    for k in range(8):
        for n in range(8):
            c[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


def _to_blocks(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H//8, W//8, 8, 8)."""
    *lead, h, w = img.shape
    x = img.reshape(*lead, h // 8, 8, w // 8, 8)
    ndim = x.ndim
    return jnp.moveaxis(x, ndim - 3, ndim - 2)


def _from_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    *lead, hb, wb, _, _ = blocks.shape
    ndim = blocks.ndim
    x = jnp.moveaxis(blocks, ndim - 2, ndim - 3)
    return x.reshape(*lead, hb * 8, wb * 8)


@functools.partial(jax.jit, static_argnames=("quality_scale",))
def dct8x8_encode(
    img_u8: jnp.ndarray, quality_scale: float = 1.0
) -> jnp.ndarray:
    """uint8 (..., H, W) grayscale plane -> int16 quantized DCT coefficients.

    H, W must be multiples of 8.
    """
    c = jnp.asarray(_dct_matrix())
    q = jnp.asarray(JPEG_LUMA_QTABLE) * quality_scale
    x = _to_blocks(img_u8.astype(jnp.float32) - 128.0)
    coeffs = jnp.einsum(
        "ij,...jk,lk->...il", c, x, c, preferred_element_type=jnp.float32
    )
    return jnp.round(coeffs / q).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("quality_scale",))
def dct8x8_decode(
    coeffs_i16: jnp.ndarray, quality_scale: float = 1.0
) -> jnp.ndarray:
    """Inverse of dct8x8_encode; returns uint8 (..., H, W)."""
    c = jnp.asarray(_dct_matrix())
    q = jnp.asarray(JPEG_LUMA_QTABLE) * quality_scale
    x = coeffs_i16.astype(jnp.float32) * q
    blocks = jnp.einsum(
        "ji,...jk,kl->...il", c, x, c, preferred_element_type=jnp.float32
    )
    img = _from_blocks(blocks) + 128.0
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)

"""On-device page rasterization from glyph streams — "ship vectors, not
pixels".

The optical-compression thesis applied to the input path: instead of
transferring ~MB of rasterized pixels per page over PCIe/DCN, the C++ engine
exports the page's *drawable primitives* (~KB: positioned glyphs + rects,
raster/rasterizer.py page_primitives) and the TPU renders the raster itself.
Host->device ingest bandwidth — the measured serving bottleneck — drops by
~200x, and rasterization lands on the idle MXU.

The renderer is matmul-shaped by construction: every glyph texel scales to
an axis-aligned pixel rectangle, a rectangle is an outer product of a row
indicator and a column indicator, and a sum of outer products is a matrix
product — so a page image is `sum_chunks A_chunk^T @ B_chunk` with
A: (R, H) row indicators and B: (R, W) column indicators built on device
from broadcasted iota compares.  Geometry mirrors the C++ CPU renderer
(nearest-neighbor glyph scaling, int truncation, 3/4-baseline) so the two
paths produce the same image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

GLYPH_H, GLYPH_W = 16, 8
EM = 12.0  # cell height covering ascent+descent (cf. pdf_engine.cc draw_glyph)


@functools.lru_cache(maxsize=1)
def _atlas() -> np.ndarray:
    from ..raster.rasterizer import glyph_atlas

    return glyph_atlas().astype(np.float32)  # (95, 16, 8)


def _glyph_rects(glyphs, n_glyphs, atlas):
    """(G, 4) glyph records -> texel rectangles.

    Returns Y0, Y1, X0, X1 of shape (G*128,) int32 (empty rects for invalid
    texels/glyphs)."""
    g = glyphs.shape[0]
    code = glyphs[:, 0].astype(jnp.int32)
    x = glyphs[:, 1]
    y = glyphs[:, 2]
    size = glyphs[:, 3]
    sy = jnp.maximum(size / EM, 1e-3)
    gw = jnp.maximum(jnp.ceil(GLYPH_W * sy), 1.0)
    gh = jnp.maximum(jnp.ceil(GLYPH_H * sy), 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y - gh * 0.75)

    ty = jnp.arange(GLYPH_H, dtype=jnp.float32)[None, :, None]  # (1,16,1)
    tx = jnp.arange(GLYPH_W, dtype=jnp.float32)[None, None, :]  # (1,1,8)
    syb = sy[:, None, None]
    # Target-pixel span of texel (ty, tx): px in [ceil(t*s), ceil((t+1)*s)),
    # clipped to the glyph box — exactly the pixels whose nearest source
    # texel (int(px/s)) is t.
    py0 = jnp.ceil(ty * syb)
    py1 = jnp.minimum(jnp.ceil((ty + 1.0) * syb), gh[:, None, None])
    px0 = jnp.ceil(tx * syb)
    px1 = jnp.minimum(jnp.ceil((tx + 1.0) * syb), gw[:, None, None])

    glyph_idx = jnp.clip(code - 32, 0, 94)
    ink = atlas[glyph_idx]  # (G, 16, 8)
    valid = (
        (ink > 0)
        & (code >= 32)[:, None, None]
        & (code <= 126)[:, None, None]
        & (jnp.arange(g)[:, None, None] < n_glyphs)
        & (py1 > py0)
        & (px1 > px0)
    )

    Y0 = (y0[:, None, None] + py0).astype(jnp.int32)
    Y1 = (y0[:, None, None] + py1).astype(jnp.int32)
    X0 = (x0[:, None, None] + px0).astype(jnp.int32)
    X1 = (x0[:, None, None] + px1).astype(jnp.int32)
    Y0 = jnp.where(valid, Y0, 0)
    Y1 = jnp.where(valid, Y1, 0)
    X0 = jnp.where(valid, X0, 0)
    X1 = jnp.where(valid, X1, 0)
    flat = lambda a: a.reshape(-1)
    return flat(Y0), flat(Y1), flat(X0), flat(X1)


def _count_image(Y0, Y1, X0, X1, h, w, chunk):
    """Rectangle-coverage count image via chunked indicator matmuls (MXU)."""
    r = Y0.shape[0]
    pad = (-r) % chunk
    Y0, Y1, X0, X1 = (
        jnp.pad(a, (0, pad)) for a in (Y0, Y1, X0, X1)
    )
    n_chunks = (r + pad) // chunk
    rows = jnp.arange(h, dtype=jnp.int32)[None, :]
    cols = jnp.arange(w, dtype=jnp.int32)[None, :]

    def body(i, count):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
        a = (
            (rows >= sl(Y0)[:, None]) & (rows < sl(Y1)[:, None])
        ).astype(jnp.bfloat16)
        b = (
            (cols >= sl(X0)[:, None]) & (cols < sl(X1)[:, None])
        ).astype(jnp.bfloat16)
        return count + jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    count0 = jnp.zeros((h, w), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, count0)


@functools.partial(jax.jit, static_argnames=("h", "w", "chunk"))
def render_pages_from_glyphs(
    glyphs: jnp.ndarray,
    n_glyphs: jnp.ndarray,
    rects: jnp.ndarray,
    n_rects: jnp.ndarray,
    h: int,
    w: int,
    chunk: int = 2048,
) -> jnp.ndarray:
    """Render a batch of pages on device.

    glyphs: (B, G, 4) f32 [ascii, x_px, y_px_baseline, size_px]
    n_glyphs: (B,) valid glyph counts
    rects: (B, M, 5) f32 [x0, y0, x1, y1, gray255]
    n_rects: (B,) valid rect counts
    Returns (B, h, w) uint8 grayscale (white background, rects under text).
    """
    atlas = jnp.asarray(_atlas())

    def one_page(g, ng, rc, nr):
        y0, y1, x0, x1 = _glyph_rects(g, ng, atlas)
        text_count = _count_image(y0, y1, x0, x1, h, w, chunk)
        # Rects (usually few): darkness = max over rects of indicator*(255-gray).
        m = rc.shape[0]
        rows = jnp.arange(h, dtype=jnp.float32)
        cols = jnp.arange(w, dtype=jnp.float32)
        def rect_body(j, dark):
            rx0, ry0, rx1, ry1, gray = (rc[j, k] for k in range(5))
            valid = j < nr
            ind = (
                ((rows >= ry0) & (rows < ry1)).astype(jnp.float32)[:, None]
                * ((cols >= rx0) & (cols < rx1)).astype(jnp.float32)[None, :]
            )
            return jnp.maximum(
                dark, jnp.where(valid, ind * (255.0 - gray), 0.0)
            )

        dark = jax.lax.fori_loop(
            0, m, rect_body, jnp.zeros((h, w), jnp.float32)
        )
        base = 255.0 - dark
        img = jnp.where(text_count > 0, 0.0, base)
        return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)

    return jax.vmap(one_page)(glyphs, n_glyphs, rects, n_rects)


def pack_primitives(primitives, g_max: int = 2048, m_max: int = 64):
    """Host-side: list of (glyphs (n,4), rects (m,5)) -> padded device arrays."""
    b = len(primitives)
    glyphs = np.zeros((b, g_max, 4), np.float32)
    n_glyphs = np.zeros((b,), np.int32)
    rects = np.zeros((b, m_max, 5), np.float32)
    n_rects = np.zeros((b,), np.int32)
    for i, (g, r) in enumerate(primitives):
        n = min(len(g), g_max)
        glyphs[i, :n] = g[:n]
        n_glyphs[i] = n
        m = min(len(r), m_max)
        rects[i, :m] = r[:m]
        n_rects[i] = m
    return glyphs, n_glyphs, rects, n_rects

import numpy as np
import jax.numpy as jnp

from vision_compression_project_tpu.ops.glyph_render import (
    pack_primitives,
    render_pages_from_glyphs,
)
from vision_compression_project_tpu.raster import PdfDocument, make_pdf
import pytest


@pytest.mark.slow
def test_device_render_matches_cpu_render(tmp_path):
    pages = [
        "Render Parity\nThe quick brown fox jumps over the lazy dog.\n"
        "0123456789 !@#$%^&*()",
        "Second Page\nAnother block of text to rasterize faithfully.",
    ]
    pdf = make_pdf(pages, tmp_path / "d.pdf")
    dpi = 72
    with PdfDocument(pdf) as doc:
        cpu = [doc.render_page(i, dpi=dpi)[..., 0] for i in range(2)]
        prims = [doc.page_primitives(i, dpi=dpi) for i in range(2)]
    h, w = cpu[0].shape
    glyphs, n_glyphs, rects, n_rects = pack_primitives(prims)
    dev = np.asarray(
        render_pages_from_glyphs(
            jnp.asarray(glyphs), jnp.asarray(n_glyphs),
            jnp.asarray(rects), jnp.asarray(n_rects), h=h, w=w, chunk=512,
        )
    )
    for i in range(2):
        diff = (dev[i] != cpu[i]).mean()
        # Float32 vs double boundary rounding can differ on isolated pixels.
        assert diff < 0.002, f"page {i}: {diff:.4%} pixels differ"
        # And the ink masses agree.
        assert abs((dev[i] < 128).mean() - (cpu[i] < 128).mean()) < 0.001


def test_glyph_stream_is_small(tmp_path):
    pdf = make_pdf(["Size check\n" + "word " * 200], tmp_path / "d.pdf")
    with PdfDocument(pdf) as doc:
        raster = doc.render_page(0, dpi=93)
        glyphs, rects = doc.page_primitives(0, dpi=93)
    stream_bytes = glyphs.nbytes + rects.nbytes
    assert stream_bytes < raster.nbytes / 50  # >50x smaller than pixels


def test_empty_page_renders_white():
    glyphs = np.zeros((1, 8, 4), np.float32)
    rects = np.zeros((1, 4, 5), np.float32)
    img = np.asarray(
        render_pages_from_glyphs(
            jnp.asarray(glyphs), jnp.asarray(np.zeros(1, np.int32)),
            jnp.asarray(rects), jnp.asarray(np.zeros(1, np.int32)),
            h=64, w=64, chunk=256,
        )
    )
    assert (img == 255).all()


def test_offcanvas_glyphs_clip_cleanly():
    """Glyphs positioned partially/fully off-canvas must clip, not wrap."""
    glyphs = np.array(
        [
            [65, -6.0, 10.0, 12.0],    # 'A' hanging off the left edge
            [66, 60.0, 4.0, 12.0],     # 'B' hanging off the right edge
            [67, 30.0, -20.0, 12.0],   # 'C' fully above the canvas
            [68, 30.0, 200.0, 12.0],   # 'D' fully below
        ],
        np.float32,
    )[None]
    rects = np.zeros((1, 2, 5), np.float32)
    img = np.asarray(
        render_pages_from_glyphs(
            jnp.asarray(glyphs), jnp.asarray(np.array([4], np.int32)),
            jnp.asarray(rects), jnp.asarray(np.zeros(1, np.int32)),
            h=64, w=64, chunk=256,
        )
    )[0]
    # Partially-visible glyphs leave some ink; fully-off-canvas glyphs none.
    assert (img < 128).any()
    assert (img[40:, :] == 255).all()  # below-canvas glyph contributed nothing
    assert (img[:, 20:45] == 255).all()  # mid-canvas stays clean (no wraparound)


def test_rect_rendering_gray_and_order():
    """Rects render at their gray level and text draws on top."""
    glyphs = np.array([[88, 20.0, 30.0, 16.0]], np.float32)[None]  # 'X'
    rects = np.array([[10.0, 10.0, 50.0, 50.0, 128.0]], np.float32)[None]
    img = np.asarray(
        render_pages_from_glyphs(
            jnp.asarray(glyphs), jnp.asarray(np.ones(1, np.int32)),
            jnp.asarray(rects), jnp.asarray(np.ones(1, np.int32)),
            h=64, w=64, chunk=256,
        )
    )[0]
    assert img[12, 12] == 128       # inside rect: gray
    assert img[5, 5] == 255         # outside rect: white
    assert (img == 0).any()         # glyph ink present (on top)

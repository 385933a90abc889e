import numpy as np
import jax.numpy as jnp

from vision_compression_project_tpu.ops.glyph_render import (
    pack_primitives,
    render_pages_from_glyphs,
)
from vision_compression_project_tpu.raster import PdfDocument, make_pdf


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

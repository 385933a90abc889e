"""Embedded-TrueType synthetic pages: pdfgen `fonts=` + raster/ttf.py.

Font-diverse training/eval pages (DejaVu faces embedded as FontFile2)
validated against INDEPENDENT implementations: metrics vs fontTools,
rendering vs PIL's FreeType, and the C++ engine's own text extraction.
The reference consumed PDFs through Poppler (reference
backend/app/pipeline/pdf_extract.py:107-122); here the engine both writes
and reads them, so every check is a round-trip through real PDF bytes.
"""

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument, make_pdf
from vision_compression_project_tpu.raster.pdfgen import FONT_ALIASES, resolve_font
from vision_compression_project_tpu.raster.ttf import (
    available_system_fonts,
    load_metrics,
)

SANS = FONT_ALIASES["dejavu_sans"]

pytestmark = pytest.mark.skipif(
    not available_system_fonts(), reason="no system TTF fonts installed"
)


def test_metrics_match_fonttools():
    """Advance widths and unitsPerEm agree with fontTools (independent)."""
    from fontTools.ttLib import TTFont

    ours = load_metrics(SANS)
    ft = TTFont(SANS)
    assert ours.units_per_em == ft["head"].unitsPerEm
    cmap = ft.getBestCmap()
    hmtx = ft["hmtx"]
    for ch in "aWm X9.,-":
        gid = cmap[ord(ch)]
        assert ours.advance(ord(ch)) == hmtx[gid][0], ch


def test_embedded_font_page_renders_and_extracts(tmp_path):
    text = "Quick brown fox 123\nsecond line with words."
    for alias in ("dejavu_sans", "dejavu_serif", "dejavu_mono"):
        pdf = make_pdf(
            [text], tmp_path / f"{alias}.pdf", font_size=18,
            fonts=[alias], page_fonts=[0],
        )
        with PdfDocument(pdf) as doc:
            raster = doc.render_page(0, dpi=96)
            ink = (np.asarray(raster) < 128).mean()
            assert ink > 0.001, f"{alias}: page rendered blank"
            assert doc.extract_text(0).strip().startswith("Quick brown fox")
            # Embedded-outline pages must ship pixels, not glyph streams
            # (the on-device atlas renderer cannot reproduce real outlines).
            assert doc.page_complexity(0) & 2


def test_rendering_overlaps_pil_freetype(tmp_path):
    """The engine's glyphs land where PIL's FreeType puts them (coarse ink
    overlap on a word rendered at the same size — independent rasterizer)."""
    from PIL import Image, ImageDraw, ImageFont

    word = "Reading"
    size_pt = 36
    pdf = make_pdf([word], tmp_path / "overlap.pdf", font_size=size_pt,
                   fonts=["dejavu_sans"], page_fonts=[0])
    with PdfDocument(pdf) as doc:
        ours = np.asarray(doc.render_page(0, dpi=72))[..., 0] < 128

    img = Image.new("L", (612, 792), 255)
    # pdfgen draws at baseline y = 792 - 72 - leading-step... the first Td
    # sets (72, 720) as the line start, then T* moves down one leading BEFORE
    # the first Tj?  No: pdfgen emits Td then (text) Tj, so the first line's
    # baseline IS at y=720 (PDF, origin bottom-left) -> row 72 from the top.
    ImageDraw.Draw(img).text(
        (72, 72), word,
        font=ImageFont.truetype(SANS, size_pt), fill=0, anchor="ls",
    )
    theirs = np.asarray(img) < 128
    inter = (ours & theirs).sum()
    union = (ours | theirs).sum()
    assert union > 200, "nothing rendered"
    iou = inter / union
    assert iou > 0.5, f"engine vs FreeType IoU too low: {iou:.3f}"


def test_ttf_wrapped_lines_fit_column():
    """Measured wrapping keeps every rendered line inside the text column
    for proportional, bold and mono faces (clipped words poison training
    targets — train/corpus.py)."""
    from vision_compression_project_tpu.train.corpus import (
        jumble_page_text,
        real_page_text,
    )

    usable_pts = 612 - 2 * 72
    for alias in ("dejavu_sans", "dejavu_serif_bold", "dejavu_mono"):
        m = load_metrics(resolve_font(alias))
        rng = np.random.default_rng(3)
        for fs, gen in ((12, real_page_text), (24, jumble_page_text)):
            page = gen(rng, lines=30, font_size=fs, font=alias)
            for line in page.splitlines():
                w = m.text_width_em(line) * fs
                assert w <= usable_pts, (alias, fs, w, line)


def test_builtin_text_unchanged_by_font_plumbing():
    """font='builtin' must keep the historical generator output (the
    running curriculum's distribution) byte-for-byte."""
    from vision_compression_project_tpu.train.corpus import real_page_text

    a = real_page_text(np.random.default_rng(11), lines=14, font_size=24)
    b = real_page_text(
        np.random.default_rng(11), lines=14, font_size=24, font="builtin"
    )
    assert a == b


def test_synthetic_batches_rotate_fonts():
    from vision_compression_project_tpu.models import get_preset
    from vision_compression_project_tpu.train.data import synthetic_batches

    cfg = get_preset("tiny")
    it = synthetic_batches(
        cfg, 4, text_len=128, dpi=40, seed=0, font_size=14, lines=4,
        kind="real", fonts=["builtin", "dejavu_sans", "dejavu_serif"],
    )
    batch = next(it)
    assert batch["pages_u8"].shape[0] == 4
    assert batch["token_ids"].shape == (4, 128)
    # Pages carry ink from whichever font was chosen.
    assert (batch["pages_u8"] < 128).any()

"""Embedded CFF/Type1C (FontFile3) rendering: the dominant font format of
LaTeX/academic PDFs (VERDICT r2 item 3; reference renders these via Poppler,
backend/app/pipeline/pdf_extract.py:107-122).

The fixture font is a genuine CFF (Type2-charstring) program built by
fontTools from DejaVu Sans outlines — an independent toolchain, so the
parser under test (raster/cpp/cff.h) shares no code with the generator.
Two container variants are exercised, both produced by real-world tools:
- bare CFF embedded as /FontFile3 /Subtype /Type1C (the LaTeX/dvipdfmx way)
- the full OpenType file as /FontFile3 /Subtype /OpenType (OTTO wrapper)
"""

import io

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument

fontTools = pytest.importorskip("fontTools")

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
TEXT_LINE_1 = "CFF Type1C fixture"
TEXT_LINE_2 = "Numerals 0123456789"


@pytest.fixture(scope="module")
def cff_font(tmp_path_factory):
    """Build a CFF-flavored OTF covering printable ASCII from DejaVu glyf
    outlines; return (otf_bytes, bare_cff_bytes, widths_1000, upem)."""
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.t2CharStringPen import T2CharStringPen
    from fontTools.ttLib import TTFont

    src = TTFont(DEJAVU)
    upem = src["head"].unitsPerEm
    glyph_set = src.getGlyphSet()
    cmap = src.getBestCmap()
    hmtx = src["hmtx"]

    chars = [chr(c) for c in range(32, 127)]
    names = []
    for ch in chars:
        name = cmap[ord(ch)]
        if name not in names:
            names.append(name)
    glyph_order = [".notdef"] + names

    charstrings = {}
    metrics = {}
    for name in glyph_order:
        width = hmtx[name][0]
        pen = T2CharStringPen(width=width, glyphSet=glyph_set)
        glyph_set[name].draw(pen)
        charstrings[name] = pen.getCharString()
        metrics[name] = (width, 0)

    fb = FontBuilder(upem, isTTF=False)
    fb.setupGlyphOrder(glyph_order)
    fb.setupCharacterMap({ord(ch): cmap[ord(ch)] for ch in chars})
    fb.setupCFF("DejaVuCFFTest", {"FullName": "DejaVuCFFTest"},
                charstrings, {})
    fb.setupHorizontalMetrics(metrics)
    fb.setupHorizontalHeader(ascent=1901, descent=-483)
    fb.setupNameTable({"familyName": "DejaVuCFFTest",
                       "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    otf_bytes = buf.getvalue()

    out = TTFont(io.BytesIO(otf_bytes))
    bare_cff = out.getTableData("CFF ")

    widths_1000 = [
        int(round(hmtx[cmap[ord(ch)]][0] * 1000.0 / upem)) for ch in chars
    ]
    return otf_bytes, bare_cff, widths_1000, upem


def _build_pdf(font_bytes: bytes, subtype: str, widths_1000) -> bytes:
    """Hand-author a one-page PDF embedding `font_bytes` as FontFile3
    (CFF; subtype Type1C/OpenType) or FontFile2 (subtype=None: TrueType),
    with identical layout either way so renders are comparable."""
    if subtype is None:
        font_subtype, file_key, file_extra = "TrueType", "FontFile2", ""
    else:
        font_subtype, file_key = "Type1", "FontFile3"
        file_extra = f"/Subtype/{subtype}"
    widths = " ".join(str(w) for w in widths_1000)
    content = (
        f"BT /F1 24 Tf 72 690 Td ({TEXT_LINE_1}) Tj ET\n"
        f"BT /F1 18 Tf 72 640 Td ({TEXT_LINE_2}) Tj ET\n"
    ).encode()

    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</Font<</F1 4 0 R>>>>/Contents 7 0 R>>",
        (
            f"<</Type/Font/Subtype/{font_subtype}/BaseFont/DejaVuCFFTest"
            "/FirstChar 32/LastChar 126/Widths[" + widths + "]"
            "/FontDescriptor 5 0 R>>"
        ).encode(),
        (
            "<</Type/FontDescriptor/FontName/DejaVuCFFTest/Flags 32"
            "/FontBBox[-1021 -463 1793 1232]/ItalicAngle 0/Ascent 928"
            f"/Descent -236/CapHeight 729/StemV 90/{file_key} 6 0 R>>"
        ).encode(),
        (f"<<{file_extra}/Length {len(font_bytes)}>>").encode()
        + b"\nstream\n" + font_bytes + b"\nendstream",
        (f"<</Length {len(content)}>>").encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<</Size {len(objs) + 1}/Root 1 0 R>>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _assert_renders_and_extracts(pdf_path):
    with PdfDocument(pdf_path) as doc:
        assert doc.page_count == 1
        assert doc.page_complexity(0) & 2, "embedded font not detected"
        img = doc.render_page(0, dpi=100)
        text = doc.extract_text(0)
    flat = text.replace("\n", " ")
    assert TEXT_LINE_1 in flat
    assert "0123456789" in flat
    h, w, _ = img.shape
    # Glyph ink where the 24pt line was drawn (y≈690/792 from bottom).
    band = img[int(h * 0.09) : int(h * 0.16), int(w * 0.10) : int(w * 0.75)]
    dark = (band < 100).all(axis=-1).mean()
    assert dark > 0.01, f"no glyph ink in CFF text band ({dark:.4f})"
    # Mostly white elsewhere (outlines, not blobs).
    assert (img > 250).all(axis=-1).mean() > 0.8
    return img


def test_type1c_bare_cff_renders_and_extracts(cff_font, tmp_path):
    _, bare_cff, widths, _ = cff_font
    path = tmp_path / "type1c.pdf"
    path.write_bytes(_build_pdf(bare_cff, "Type1C", widths))
    _assert_renders_and_extracts(path)


def test_opentype_wrapped_cff_renders(cff_font, tmp_path):
    otf_bytes, _, widths, _ = cff_font
    path = tmp_path / "otto.pdf"
    path.write_bytes(_build_pdf(otf_bytes, "OpenType", widths))
    _assert_renders_and_extracts(path)


def test_cff_glyphs_match_truetype_shape(cff_font, tmp_path):
    """The CFF rasterization must agree pixel-wise with the TrueType
    rasterization of the same DejaVu outlines at the same positions (two
    independent charstring interpreters, cff.h vs truetype.h) — catching
    systematic scale/flip/placement/winding bugs in either."""
    _, bare_cff, widths, _ = cff_font
    cff_path = tmp_path / "cff.pdf"
    cff_path.write_bytes(_build_pdf(bare_cff, "Type1C", widths))
    with PdfDocument(cff_path) as doc:
        cff_img = doc.render_page(0, dpi=150)

    ttf_path = tmp_path / "ttf.pdf"
    with open(DEJAVU, "rb") as f:
        ttf_bytes = f.read()
    ttf_path.write_bytes(_build_pdf(ttf_bytes, None, widths))
    with PdfDocument(ttf_path) as doc:
        ttf_img = doc.render_page(0, dpi=150)

    a = (cff_img < 128).all(axis=-1)
    b = (ttf_img < 128).all(axis=-1)
    inter = (a & b).sum()
    union = (a | b).sum()
    assert union > 0
    iou = inter / union
    assert iou > 0.8, f"CFF vs TrueType glyph IoU too low: {iou:.3f}"

"""Tiling and shading pattern fills (VERDICT r4 missing item 4: the last
named renderer gaps vs Poppler, which renders these for the reference via
pdf2image — reference backend/app/pipeline/pdf_extract.py:107-122).

Fixture sources, layered-validation style:
  * hand-authored spec PDFs (PatternType 1 colored/uncolored, PatternType
    2 shading) with assertions on periodicity, coverage, alpha (gaps show
    the backdrop) and gradient direction;
  * matplotlib's PDF backend as the INDEPENDENT producer of real-world
    tiling patterns (hatched bars), cross-checked against matplotlib's own
    Agg raster of the identical figure.
"""

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument


def _pdf(path, objs):
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF\n"
    )
    path.write_bytes(bytes(out))
    return path


def _pattern_pdf(path, pattern_obj, content, extra_objs=()):
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 120 120]"
        b" /Resources << /Pattern << /P0 4 0 R >> >> /Contents 5 0 R >>",
        pattern_obj,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        *extra_objs,
    ]
    return _pdf(path, objs)


def _tiling(cell_content, paint_type=1, bbox=b"[0 0 20 20]", step=b"20"):
    return (
        b"<< /Type /Pattern /PatternType 1 /PaintType "
        + str(paint_type).encode()
        + b" /TilingType 1 /BBox " + bbox + b" /XStep " + step
        + b" /YStep " + step + b" /Resources << >> /Length "
        + str(len(cell_content)).encode() + b" >>\nstream\n"
        + cell_content + b"\nendstream"
    )


def test_tiling_pattern_periodicity_and_coverage(tmp_path):
    # Cell: black 10x10 square in the lower-left quarter of a 20x20 cell.
    pdf = _pattern_pdf(
        tmp_path / "tile.pdf",
        _tiling(b"0 0 0 rg 0 0 10 10 re f"),
        b"/Pattern cs /P0 scn 10 10 100 100 re f",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    assert page.shape[:2] == (120, 120)
    gray = page.mean(axis=2)
    fill = gray[12:108, 12:108]  # interior of the filled region (px == pt)
    ink = (fill < 128).mean()
    # 10x10 ink per 20x20 cell = 25% coverage.
    assert 0.15 < ink < 0.35, f"tile coverage {ink:.3f} not ~0.25"
    # Periodicity: the pattern repeats every 20 px in both axes.
    a = gray[20:90, 20:90]
    assert np.mean(np.abs(a - gray[40:110, 20:90]) < 60) > 0.9, "y period"
    assert np.mean(np.abs(a - gray[20:90, 40:110]) < 60) > 0.9, "x period"
    # Outside the filled path: untouched white.
    assert gray[:8, :].min() > 240
    assert gray[:, :8].min() > 240


def test_tiling_pattern_gaps_show_backdrop(tmp_path):
    # Red backdrop first; the pattern's unpainted cell area must stay red
    # (alpha recovered from the white/black double render), not white.
    pdf = _pattern_pdf(
        tmp_path / "gaps.pdf",
        _tiling(b"0 0 0 rg 0 0 10 10 re f"),
        b"1 0 0 rg 0 0 120 120 re f "
        b"/Pattern cs /P0 scn 10 10 100 100 re f",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    region = page[30:90, 30:90].reshape(-1, 3)
    red = (region[:, 0] > 180) & (region[:, 1] < 90)
    black = region.max(axis=1) < 90
    assert red.mean() > 0.4, f"backdrop not visible through gaps ({red.mean():.2f})"
    assert black.mean() > 0.1, "pattern ink missing"
    white = (region.min(axis=1) > 230).mean()
    assert white < 0.2, f"gaps rendered opaque white ({white:.2f})"


def test_uncolored_pattern_takes_current_color(tmp_path):
    # PaintType 2: cell defines coverage only; scn's numeric operands give
    # the paint color (blue here).
    pdf = _pattern_pdf(
        tmp_path / "uncolored.pdf",
        _tiling(b"0 0 20 10 re f", paint_type=2),
        b"/Pattern cs 0 0 1 /P0 scn 10 10 100 100 re f",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    region = page[30:90, 30:90].reshape(-1, 3)
    blue = (region[:, 2] > 150) & (region[:, 0] < 110)
    assert 0.3 < blue.mean() < 0.7, f"blue stripes {blue.mean():.2f} not ~0.5"


def test_shading_pattern_fills_path(tmp_path):
    # PatternType 2 axial black->white left-to-right, filling a triangle:
    # inside the triangle the gradient must brighten rightward; outside
    # stays white.
    pat = (
        b"<< /Type /Pattern /PatternType 2 /Shading"
        b" << /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 120 0]"
        b" /Extend [true true] /Function << /FunctionType 2 /Domain [0 1]"
        b" /C0 [0 0 0] /C1 [1 1 1] /N 1 >> >> >>"
    )
    pdf = _pattern_pdf(
        tmp_path / "shpat.pdf",
        pat,
        b"/Pattern cs /P0 scn 10 10 m 110 10 l 10 110 l h f",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    # Bottom rows of the triangle (PDF y=15 -> raster row ~104).
    row = gray[102, :]
    left, right = row[15:35].mean(), row[80:100].mean()
    assert left < right - 40, f"gradient not left-dark ({left:.0f} vs {right:.0f})"
    # Outside the triangle's hypotenuse: white.
    assert gray[20, 100] > 240


def test_matplotlib_hatch_pattern(tmp_path):
    # Independent producer: matplotlib writes hatches as PDF tiling
    # patterns.  The same figure rendered by matplotlib's own Agg backend
    # is the coverage reference.
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(2, 2), dpi=72)
    ax.bar([0, 1], [1.0, 0.6], hatch="//", facecolor="white",
           edgecolor="black")
    ax.set_xticks([])
    ax.set_yticks([])
    pdf_path = tmp_path / "hatch.pdf"
    png_path = tmp_path / "hatch.png"
    fig.savefig(pdf_path)
    fig.savefig(png_path)
    plt.close(fig)
    if b"/PatternType" not in pdf_path.read_bytes():
        pytest.skip("matplotlib PDF backend wrote no tiling pattern")

    from PIL import Image

    ref = np.asarray(Image.open(png_path).convert("RGB"))
    with PdfDocument(pdf_path) as doc:
        page = doc.render_page(0, dpi=72)
    # Same figure, same dpi: compare ink fractions (hatch strokes are thin,
    # so demand agreement within a factor, not pixel equality).
    ink_ref = (ref.mean(axis=2) < 128).mean()
    ink_ours = (page.mean(axis=2) < 128).mean()
    assert ink_ours > 0.25 * ink_ref, (
        f"hatch missing: ours {ink_ours:.4f} vs Agg {ink_ref:.4f}"
    )
    assert ink_ours < 4.0 * ink_ref + 0.02, (
        f"hatch overdrawn: ours {ink_ours:.4f} vs Agg {ink_ref:.4f}"
    )

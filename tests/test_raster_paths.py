"""Vector path fills (m/l/c/h + f/f*): figure patches — previously only
`re` rect fills rendered, so charts/diagrams were invisible."""

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument

from tests.test_raster_shading import _pdf


def _content_pdf(path, content):
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    return _pdf(path, objs)


def test_triangle_fill(tmp_path):
    pdf = _content_pdf(
        tmp_path / "tri.pdf", b"0 g 20 20 m 140 20 l 80 100 l h f"
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    assert gray[int(h * 0.7), w // 2] < 40    # inside near the base
    assert gray[int(h * 0.25), w // 2] < 40   # inside near the apex
    assert gray[int(h * 0.25), int(w * 0.12)] > 230  # outside left of apex
    assert gray[2, 2] > 230


def test_bezier_disc_fill(tmp_path):
    # Circle of radius 40 at (80,60) from four cubic arcs (k = 0.5523 * r).
    k = b"22.09"
    content = (
        b"0 g 120 60 m "
        b"120 82.09 102.09 100 80 100 c "
        b"57.91 100 40 82.09 40 60 c "
        b"40 37.91 57.91 20 80 20 c "
        b"102.09 20 120 37.91 120 60 c h f"
    )
    pdf = _content_pdf(tmp_path / "disc.pdf", content)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    assert gray[h // 2, w // 2] < 40                # center filled
    assert gray[h // 2, int(w * 0.9)] > 230         # outside right
    assert gray[int(h * 0.08), w // 2] > 230        # outside top
    # circular-ish: the corner of the bounding box is outside the disc
    assert gray[int(h * 0.22), int(w * 0.30)] > 200


def test_even_odd_ring(tmp_path):
    """f*: outer square + inner square -> even-odd leaves a hole."""
    content = (
        b"0 g 30 20 m 130 20 l 130 100 l 30 100 l h "
        b"60 45 m 100 45 l 100 75 l 60 75 l h f*"
    )
    pdf = _content_pdf(tmp_path / "ring.pdf", content)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    assert gray[h // 2, w // 2] > 230       # hole
    assert gray[h // 2, int(w * 0.27)] < 40  # ring body
    assert gray[int(h * 0.9), w // 2] > 230  # outside


def test_matplotlib_bar_chart_renders(tmp_path):
    """Independent producer: a matplotlib bar chart's patches are path
    fills; the page must show real ink where the bars are."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(4, 3))
    ax = fig.add_axes([0.1, 0.1, 0.85, 0.85])
    ax.bar([0, 1, 2], [3, 1, 2], color="black")
    ax.axis("off")
    pdf = tmp_path / "bars.pdf"
    fig.savefig(pdf)
    plt.close(fig)
    with PdfDocument(pdf) as doc:
        assert doc.page_complexity(0) != 0  # figures -> pixel transport
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    ink = (gray < 100).mean()
    assert ink > 0.15, ink  # bars cover a real fraction of the page
    # The tall first bar is dark high up; the gap between bars is light.
    col_bar0 = int(w * 0.22)
    col_gap = int(w * 0.38)
    assert gray[int(h * 0.35), col_bar0] < 60
    assert gray[int(h * 0.35), col_gap] > 180


def test_stroke_line_chart(tmp_path):
    """Strokes (S): a matplotlib LINE chart's axes and data line must leave
    ink — previously strokes were dropped entirely."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(4, 3))
    ax = fig.add_axes([0.12, 0.12, 0.83, 0.83])
    ax.plot([0, 1, 2, 3], [0, 2, 1, 3], color="black", linewidth=3)
    ax.tick_params(colors="black")
    pdf = tmp_path / "line.pdf"
    fig.savefig(pdf)
    plt.close(fig)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=100)
    gray = page.mean(axis=2)
    ink = (gray < 100).mean()
    assert ink > 0.005, ink  # the polyline + axes spines leave real ink


def test_stroke_simple_segment(tmp_path):
    pdf = _content_pdf(
        tmp_path / "seg.pdf", b"0 g 6 w 20 60 m 140 60 l S"
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    assert gray[h // 2, w // 2] < 40           # on the line
    assert gray[int(h * 0.2), w // 2] > 230    # off the line


def test_colored_fill_and_stroke(tmp_path):
    """rg/RG: path fills use the fill color, strokes the stroke color."""
    pdf = _content_pdf(
        tmp_path / "color.pdf",
        b"1 0 0 rg 20 20 m 70 20 l 70 70 l 20 70 l h f "
        b"0 0 1 RG 6 w 100 30 m 140 90 l S",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    sq = page[int(h * 0.55) : int(h * 0.8), int(w * 0.15) : int(w * 0.4)]
    sq = sq.reshape(-1, 3).mean(0)
    assert sq[0] > 180 and sq[1] < 80 and sq[2] < 80, sq   # red square
    ln = page[h // 2, int(w * 0.74)]
    assert ln[2] > 150 and ln[0] < 100, ln                  # blue stroke


def test_matplotlib_color_chart(tmp_path):
    """Default-color matplotlib bars render with their actual hues."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(4, 3))
    ax = fig.add_axes([0.05, 0.05, 0.9, 0.9])
    ax.bar([0], [1], color="red", width=0.9)
    ax.bar([1], [1], color="blue", width=0.9)
    ax.axis("off")
    pdf = tmp_path / "colorbars.pdf"
    fig.savefig(pdf)
    plt.close(fig)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    left = page[h // 2, int(w * 0.3)]
    right = page[h // 2, int(w * 0.72)]
    assert left[0] > 150 and left[2] < 100, left     # red bar
    assert right[2] > 150 and right[0] < 100, right  # blue bar


def test_dashed_stroke(tmp_path):
    """d: dashed strokes leave alternating ink and gaps."""
    pdf = _content_pdf(
        tmp_path / "dash.pdf",
        b"0 g 4 w [12 12] 0 d 10 60 m 150 60 l S",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    row = gray[h // 2, 10:150]
    dark = (row < 100)
    frac = dark.mean()
    assert 0.3 < frac < 0.7, frac          # roughly half on, half off
    # The pattern alternates: there are multiple dark runs, not one.
    transitions = int(np.abs(np.diff(dark.astype(int))).sum())
    assert transitions >= 6, transitions

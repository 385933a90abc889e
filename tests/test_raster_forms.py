"""Form XObjects (/Subtype /Form): reusable content streams with their own
resources and placement matrix — matplotlib scatter markers and LaTeX
boxes draw through these (previously silently skipped)."""

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument

from tests.test_raster_shading import _pdf


def test_form_xobject_placed_twice(tmp_path):
    """One form (a filled triangle), placed at two CTMs, renders twice."""
    form_content = b"0 g 0 0 m 20 0 l 10 16 l h f"
    form = (
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 20 16]"
        b" /Length " + str(len(form_content)).encode() + b" >>\nstream\n"
        + form_content + b"\nendstream"
    )
    content = b"q 1 0 0 1 20 20 cm /Fm1 Do Q q 2 0 0 2 100 60 cm /Fm1 Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Resources << /XObject << /Fm1 4 0 R >> >> /Contents 5 0 R >>",
        form,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    pdf = _pdf(tmp_path / "form.pdf", objs)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    # First placement: triangle near (20..40, 20..36) in PDF coords.
    assert gray[h - 26, 30] < 40        # inside instance 1
    # Second placement at 2x scale near (100..140, 60..92).
    assert gray[h - 70, 120] < 40       # inside instance 2
    assert gray[5, 5] > 230             # background untouched


def test_matplotlib_scatter_markers_render(tmp_path):
    """Scatter markers are Form XObjects in matplotlib output."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(4, 3))
    ax = fig.add_axes([0.05, 0.05, 0.9, 0.9])
    ax.scatter([0, 1, 2, 3] * 3, list(range(12)), s=400, color="black")
    ax.axis("off")
    pdf = tmp_path / "scatter.pdf"
    fig.savefig(pdf)
    plt.close(fig)
    raw = pdf.read_bytes()
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    ink = (gray < 100).mean()
    assert ink > 0.01, ink  # the 12 big markers leave real ink


def test_extgstate_alpha_blend(tmp_path):
    """ExtGState ca: two overlapping 50%-alpha fills blend with the page
    and each other — matplotlib alpha patches emit exactly this."""
    content = (
        b"/GS0 gs 1 0 0 rg 20 20 m 100 20 l 100 90 l 20 90 l h f "
        b"0 0 1 rg 60 20 m 140 20 l 140 90 l 60 90 l h f"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Resources << /ExtGState << /GS0 << /Type /ExtGState /ca 0.5"
        b" /CA 0.5 >> >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    pdf = _pdf(tmp_path / "alpha.pdf", objs)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    red_only = page[h // 2, int(w * 0.25)].astype(int)
    overlap = page[h // 2, int(w * 0.5)].astype(int)
    # 50% red over white: ~(255, 128, 128).
    assert abs(red_only[0] - 255) < 8 and abs(red_only[1] - 128) < 16
    # 50% blue over that: blue rises, red falls toward ~191/64.
    assert overlap[2] > red_only[2] + 40
    assert overlap[0] < red_only[0] - 40


def test_matplotlib_alpha_patch(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(4, 3))
    ax = fig.add_axes([0.05, 0.05, 0.9, 0.9])
    ax.bar([0], [1], color="black", alpha=0.4, width=1.0)
    ax.axis("off")
    pdf = tmp_path / "alpha_mpl.pdf"
    fig.savefig(pdf)
    plt.close(fig)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    bar = gray[h // 2, int(w * 0.5)]
    # 40% black over white ~ 153 gray: neither white nor solid black.
    assert 110 < bar < 200, bar


def test_cs_scn_device_and_separation(tmp_path):
    """cs/scn color selection: DeviceRGB via scn, and a /Separation spot
    color resolved through its type-2 tint transform."""
    content = (
        b"/CS0 cs 1 0 0 scn 10 70 m 70 70 l 70 110 l 10 110 l h f "
        b"/Spot cs 1 scn 90 70 m 150 70 l 150 110 l 90 110 l h f"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Resources << /ColorSpace << /CS0 /DeviceRGB /Spot 4 0 R >> >>"
        b" /Contents 5 0 R >>",
        # Spot 'GreenInk': tint t -> RGB (0, t, 0.2t)
        b"[ /Separation /GreenInk /DeviceRGB << /FunctionType 2"
        b" /Domain [0 1] /C0 [0 0 0] /C1 [0 1 0.2] /N 1 >> ]",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    pdf = _pdf(tmp_path / "scn.pdf", objs)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    left = page[int(h * 0.15) : int(h * 0.35), int(w * 0.1) : int(w * 0.4)]
    right = page[int(h * 0.15) : int(h * 0.35), int(w * 0.6) : int(w * 0.9)]
    lm, rm = left.reshape(-1, 3).mean(0), right.reshape(-1, 3).mean(0)
    assert lm[0] > 180 and lm[1] < 80, lm      # scn red
    assert rm[1] > 180 and rm[0] < 80, rm      # separation -> green
    assert 30 < rm[2] < 90, rm                 # tint's 0.2 blue component

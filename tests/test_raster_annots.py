"""Annotation appearance streams (ISO 32000 12.5.5) — form-field widgets,
stamps and markup annotations whose visuals live in /AP, not the page
content.  Poppler paints these for the reference (filled-in form PDFs are
blank without them).  Spec-authored fixtures assert the Algorithm-8.1
placement (BBox through /Matrix fitted onto /Rect), /AS state selection,
and the Hidden-flag / Link exclusions.
"""

import numpy as np

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


def _stream(dict_body, content):
    return (
        b"<< " + dict_body + b" /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream"
    )


def _annot_pdf(path, annot_objs, annot_refs, extra_objs=()):
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 120 120]"
        b" /Resources << >> /Contents 4 0 R /Annots [" + annot_refs + b"] >>",
        _stream(b"", b""),  # empty page content: only annots paint
        *annot_objs,
        *extra_objs,
    ]
    return _pdf(path, objs)


def _render(path):
    with PdfDocument(path) as doc:
        assert doc.page_count == 1
        return doc.render_page(0, dpi=72)


def test_appearance_scaled_onto_rect(tmp_path):
    # BBox [0 0 10 10] appearance of a red filled square, Rect 4x larger:
    # Algorithm 8.1 scales the appearance onto [20,20]..[60,60].
    ap = _stream(
        b"/Type /XObject /Subtype /Form /BBox [0 0 10 10]",
        b"1 0 0 rg 0 0 10 10 re f",
    )
    annot = (
        b"<< /Type /Annot /Subtype /Square /Rect [20 20 60 60]"
        b" /AP << /N 6 0 R >> >>"
    )
    pdf = _annot_pdf(tmp_path / "sq.pdf", [annot, ap], b"5 0 R")
    page = _render(pdf)
    # PDF y 20..60 -> raster rows 60..100 (page height 120).
    inside = page[65:95, 25:55]
    assert inside[..., 0].min() > 150 and inside[..., 1].max() < 100, (
        "appearance not painted red inside Rect"
    )
    outside = page[5:50, 5:15]
    assert outside.min() > 240, "paint leaked outside Rect"


def test_appearance_matrix_offset_refitted(tmp_path):
    # The appearance /Matrix translates the BBox far away; Algorithm 8.1
    # must map the TRANSFORMED bbox back onto Rect, so the result is
    # identical to the untranslated case.
    ap = _stream(
        b"/Type /XObject /Subtype /Form /BBox [0 0 10 10]"
        b" /Matrix [1 0 0 1 500 700]",
        b"0 0 1 rg 0 0 10 10 re f",
    )
    annot = (
        b"<< /Type /Annot /Subtype /Square /Rect [40 40 80 80]"
        b" /AP << /N 6 0 R >> >>"
    )
    pdf = _annot_pdf(tmp_path / "mat.pdf", [annot, ap], b"5 0 R")
    page = _render(pdf)
    inside = page[45:75, 45:75]
    assert inside[..., 2].min() > 150 and inside[..., 0].max() < 100, (
        "matrix-offset appearance not refitted onto Rect"
    )


def test_widget_state_dict_uses_as(tmp_path):
    # Checkbox widget: /N is a state dictionary; /AS picks /On (a black
    # cross), /Off would be empty.
    on = _stream(
        b"/Type /XObject /Subtype /Form /BBox [0 0 10 10]",
        b"0 0 0 rg 1 4 8 2 re f 4 1 2 8 re f",
    )
    off = _stream(b"/Type /XObject /Subtype /Form /BBox [0 0 10 10]", b"")
    annot = (
        b"<< /Type /Annot /Subtype /Widget /FT /Btn /AS /On"
        b" /Rect [50 50 70 70] /AP << /N << /On 6 0 R /Off 7 0 R >> >> >>"
    )
    pdf = _annot_pdf(tmp_path / "chk.pdf", [annot, on, off], b"5 0 R")
    page = _render(pdf)
    box = page[50:70, 50:70]
    assert (box.min(axis=2) < 100).mean() > 0.1, "checkbox /On state blank"


def test_hidden_and_link_annots_not_painted(tmp_path):
    ap = _stream(
        b"/Type /XObject /Subtype /Form /BBox [0 0 10 10]",
        b"0 0 0 rg 0 0 10 10 re f",
    )
    hidden = (
        b"<< /Type /Annot /Subtype /Square /F 2 /Rect [10 10 50 50]"
        b" /AP << /N 7 0 R >> >>"
    )
    link = (
        b"<< /Type /Annot /Subtype /Link /Rect [60 60 110 110]"
        b" /AP << /N 7 0 R >> >>"
    )
    pdf = _annot_pdf(tmp_path / "hid.pdf", [hidden, link, ap],
                     b"5 0 R 6 0 R")
    page = _render(pdf)
    assert page.min() > 240, "hidden/link annotation painted"

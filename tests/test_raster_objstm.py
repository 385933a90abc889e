"""Object-stream (modern PDF 1.5+) parser-path test: the catalog, page tree
and page object live compressed inside a /Type /ObjStm stream, so they are
invisible to the plain object scan and must come from expand_object_streams.
"""

import zlib

import pytest

from vision_compression_project_tpu.raster import PdfDocument


def _build_objstm_pdf(tmp_path):
    # Objects 1 (catalog), 2 (pages), 4 (page) packed into ObjStm object 3.
    inner_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] >>"),
        (4, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b"/Resources << /Font << /F1 6 0 R >> >> >>"),
    ]
    header_parts = []
    body = b""
    for num, payload in inner_objs:
        header_parts.append(f"{num} {len(body)}".encode())
        body += payload + b"\n"
    head = b" ".join(header_parts) + b"\n"
    stm_payload = zlib.compress(head + body)

    content = b"BT /F1 12 Tf 72 720 Td (Hello ObjStm world) Tj ET"

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def emit(num, body_bytes):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode())
        out.extend(body_bytes)
        out.extend(b"\nendobj\n")

    emit(
        3,
        f"<< /Type /ObjStm /N {len(inner_objs)} /First {len(head)} "
        f"/Length {len(stm_payload)} /Filter /FlateDecode >>".encode()
        + b"\nstream\n" + stm_payload + b"\nendstream",
    )
    emit(5, f"<< /Length {len(content)} >>".encode() + b"\nstream\n" + content + b"\nendstream")
    emit(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    out.extend(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    path = tmp_path / "objstm.pdf"
    path.write_bytes(bytes(out))
    return path


def test_objstm_pdf_parses_and_extracts(tmp_path):
    path = _build_objstm_pdf(tmp_path)
    with PdfDocument(path) as doc:
        assert doc.page_count == 1
        w, h = doc.page_size_pts(0)
        assert (w, h) == (612.0, 792.0)
        text = doc.extract_text(0)
        assert "Hello ObjStm world" in text
        img = doc.render_page(0, dpi=72)
        assert (img < 128).any()  # ink rendered

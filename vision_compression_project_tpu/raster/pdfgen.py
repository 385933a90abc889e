"""Minimal synthetic PDF writer (pure Python, stdlib only).

Produces simple multi-page text PDFs for tests and benchmarks, so the suite
never depends on external documents.  Streams can optionally be Flate-
compressed to exercise the C++ engine's decode path.
"""

from __future__ import annotations

import zlib
from pathlib import Path
from typing import List, Sequence, Union

PAGE_W, PAGE_H = 612, 792  # US Letter, points


def _escape(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(
    pages: Sequence[Union[str, List[str]]],
    path,
    compress: bool = False,
    font_size: int = 12,
    margin: int = 72,
) -> Path:
    """Write a PDF where each element of `pages` is the page's text
    (string with newlines, or list of lines)."""
    path = Path(path)
    objects: List[bytes] = []  # 1-indexed

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)

    page_obj_ids = []
    content_ids = []
    font_id_placeholder = None

    # Reserve: 1 = catalog, 2 = pages root, 3 = font.  Build bottom-up after.
    n_pages = len(pages)
    # Object numbering plan: 1 catalog, 2 pages, 3 font, then per page:
    # (4 + 2*i) page, (5 + 2*i) contents.
    header = b"%PDF-1.4\n%\xc7\xec\x8f\xa2\n"
    out = bytearray(header)
    offsets = {}

    def emit(num: int, body: bytes):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode())
        out.extend(body)
        out.extend(b"\nendobj\n")

    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(
        2,
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
        f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] >>".encode(),
    )
    emit(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    for i, page in enumerate(pages):
        lines = page.splitlines() if isinstance(page, str) else list(page)
        leading = int(font_size * 1.4)
        ops = [b"BT", f"/F1 {font_size} Tf".encode(), f"{leading} TL".encode()]
        ops.append(f"{margin} {PAGE_H - margin} Td".encode())
        for line in lines:
            ops.append(b"(" + _escape(line).encode("latin-1", "replace") + b") Tj T*")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            stream = zlib.compress(stream)
            cdict = f"<< /Length {len(stream)} /Filter /FlateDecode >>".encode()
        else:
            cdict = f"<< /Length {len(stream)} >>".encode()
        emit(
            4 + 2 * i,
            f"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode(),
        )
        emit(5 + 2 * i, cdict + b"\nstream\n" + stream + b"\nendstream")

    # xref
    n_obj = 3 + 2 * n_pages
    xref_pos = len(out)
    out.extend(f"xref\n0 {n_obj + 1}\n".encode())
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, n_obj + 1):
        out.extend(f"{offsets[num]:010d} 00000 n \n".encode())
    out.extend(
        f"trailer\n<< /Size {n_obj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(bytes(out))
    return path

"""Image /SMask soft masks (VERDICT r3 missing item 3: alpha-composited
images — logos, figures with transparency — that Poppler gives the
reference for free, reference backend/app/pipeline/pdf_extract.py:107-122).

Fixture 1 comes from an INDEPENDENT producer: Pillow's PDF plugin writes
RGBA images as a JPXDecode XObject with /SMaskInData 1 (alpha inside the
JPEG 2000 codestream).  Fixture 2 is hand-authored with a separate /SMask
stream at a DIFFERENT resolution than the image (the spec allows it;
samplers must map in unit-square coordinates).
"""

import zlib

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument


@pytest.fixture(scope="module")
def pillow_rgba_pdf(tmp_path_factory):
    """Red field, alpha 0 outside a centered window, 255 inside, one row
    of 128 at the window's top edge."""
    from PIL import Image

    a = np.zeros((100, 160, 4), np.uint8)
    a[..., 0] = 220  # red-ish everywhere
    a[30:70, 40:120, 3] = 255     # opaque window
    a[20:30, 40:120, 3] = 128     # half-transparent band above it
    path = tmp_path_factory.mktemp("smask") / "rgba.pdf"
    Image.fromarray(a, "RGBA").save(path, "PDF", resolution=72)
    raw = path.read_bytes()
    assert b"/SMask" in raw  # Pillow wrote a real soft mask
    return path


def test_pillow_smask_composites(pillow_rgba_pdf):
    with PdfDocument(pillow_rgba_pdf) as doc:
        assert doc.page_count == 1
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]

    def region(y0, y1, x0, x1):
        return page[int(h * y0) : int(h * y1), int(w * x0) : int(w * x1)]

    # Fully transparent corners: page stays white.
    corner = region(0.0, 0.1, 0.0, 0.15)
    assert corner.min() > 240, f"transparent region painted ({corner.min()})"
    # Opaque window: the red shows (R >> G).
    win = region(0.4, 0.6, 0.35, 0.65)
    assert win[..., 0].mean() > 180
    assert win[..., 1].mean() < 90, "window not composited as red"
    # Half-alpha band: blend of white page and red -> G channel mid-range.
    band = region(0.22, 0.28, 0.35, 0.65)
    assert 90 < band[..., 1].mean() < 200, (
        f"half-alpha band not blended (G={band[..., 1].mean():.0f})"
    )


def _smask_pdf_mixed_res(path):
    """Hand-authored: 8x8 blue RGB image scaled over the page, masked by a
    32x32 SMask whose left half is 0 and right half is 255."""
    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 2] = 255
    idata = zlib.compress(img.tobytes())
    mask = np.zeros((32, 32), np.uint8)
    mask[:, 16:] = 255
    mdata = zlib.compress(mask.tobytes())
    content = b"q 200 0 0 200 50 500 cm /Im1 Do Q\n"
    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</XObject<</Im1 4 0 R>>>>/Contents 6 0 R>>",
        (
            "<</Type/XObject/Subtype/Image/Width 8/Height 8"
            "/ColorSpace/DeviceRGB/BitsPerComponent 8/Filter/FlateDecode"
            f"/SMask 5 0 R/Length {len(idata)}>>"
        ).encode() + b"\nstream\n" + idata + b"\nendstream",
        (
            "<</Type/XObject/Subtype/Image/Width 32/Height 32"
            "/ColorSpace/DeviceGray/BitsPerComponent 8/Filter/FlateDecode"
            f"/Length {len(mdata)}>>"
        ).encode() + b"\nstream\n" + mdata + b"\nendstream",
        (f"<</Length {len(content)}>>").encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
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
    path.write_bytes(bytes(out))


def test_smask_resolution_mismatch(tmp_path):
    """Mask grid != image grid: unit-square sampling keeps them aligned."""
    path = tmp_path / "mixres.pdf"
    _smask_pdf_mixed_res(path)
    with PdfDocument(path) as doc:
        page = doc.render_page(0, dpi=72)
    # Image square: 200x200pt at (50,500) -> px y 92..292, x 50..250.
    left = page[120:260, 70:130]
    right = page[120:260, 170:230]
    assert left.min() > 240, "masked-out half painted"
    assert right[..., 2].mean() > 180 and right[..., 0].mean() < 80, (
        "opaque half not blue"
    )

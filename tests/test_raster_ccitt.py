"""CCITT G4 + DeviceCMYK image XObjects (VERDICT r2 item: the rarer image
codecs Poppler gives the reference for free).

The G4 fixture comes from an INDEPENDENT encoder (PIL's PDF plugin writes
mode-1 images as CCITTFaxDecode K=-1 with BlackIs1 true), so the decoder in
raster/cpp/ccitt.h is validated against a real Group 4 bitstream, not our
own bytes.  The CMYK fixture is a hand-authored PDF with a Flate-compressed
DeviceCMYK image.
"""

import zlib

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument


@pytest.fixture(scope="module")
def ccitt_pdf(tmp_path_factory):
    """Black page with a centered white rectangle, G4-encoded by PIL."""
    from PIL import Image

    img = np.zeros((100, 160), np.uint8)  # black field
    img[20:80, 40:120] = 255              # white box
    path = tmp_path_factory.mktemp("ccitt") / "g4.pdf"
    Image.fromarray(img).convert("1").save(path, "PDF", resolution=72)
    raw = path.read_bytes()
    assert b"CCITTFaxDecode" in raw  # PIL wrote a real G4 stream
    return path


def test_ccitt_g4_image_renders(ccitt_pdf):
    with PdfDocument(ccitt_pdf) as doc:
        assert doc.page_count == 1
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    # Page ~160x100pt at 72dpi -> ~160x100 px.
    inner = page[int(h * 0.35) : int(h * 0.6), int(w * 0.35) : int(w * 0.6)]
    outer = page[: int(h * 0.1), : int(w * 0.15)]
    assert inner.mean() > 200, inner.mean()  # white box recovered
    assert outer.mean() < 60, outer.mean()   # black field recovered


def test_ccitt_g4_structure(ccitt_pdf):
    """Pixel-accurate: the decoded geometry matches the source bitmap —
    vertical/horizontal/pass modes and the run tables all in play."""
    with PdfDocument(ccitt_pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    ys, xs = np.where(gray > 128)
    assert len(ys) > 0
    # White box occupies rows ~20-80 of 100 and cols ~40-120 of 160.
    h, w = gray.shape
    assert abs(ys.min() / h - 0.20) < 0.06 and abs(ys.max() / h - 0.80) < 0.06
    assert abs(xs.min() / w - 0.25) < 0.06 and abs(xs.max() / w - 0.75) < 0.06


def _cmyk_pdf(path):
    """Minimal PDF: one page with a Flate DeviceCMYK image XObject —
    left half pure cyan, right half pure yellow, bottom strip black."""
    w, h = 8, 6
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if y >= h - 2:
                px += bytes((0, 0, 0, 255))          # black via K
            elif x < w // 2:
                px += bytes((255, 0, 0, 0))          # cyan
            else:
                px += bytes((0, 0, 255, 0))          # yellow
    data = zlib.compress(bytes(px))
    img = (
        b"<< /Type /XObject /Subtype /Image /Width 8 /Height 6"
        b" /ColorSpace /DeviceCMYK /BitsPerComponent 8"
        b" /Filter /FlateDecode /Length " + str(len(data)).encode() + b" >>\n"
        b"stream\n" + data + b"\nendstream"
    )
    content = b"q 160 0 0 120 0 0 cm /Im1 Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
        img,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
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
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode()
        + b"\n%%EOF\n"
    )
    path.write_bytes(bytes(out))
    return path


def test_cmyk_flate_image_renders(tmp_path):
    pdf = _cmyk_pdf(tmp_path / "cmyk.pdf")
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    left = page[int(h * 0.2) : int(h * 0.45), : int(w * 0.4)].reshape(-1, 3)
    right = page[int(h * 0.2) : int(h * 0.45), int(w * 0.6) :].reshape(-1, 3)
    bottom = page[int(h * 0.75) :, :].reshape(-1, 3)
    lm, rm, bm = left.mean(0), right.mean(0), bottom.mean(0)
    # cyan: low R, high G/B; yellow: high R/G, low B; black: all low.
    assert lm[0] < 90 and lm[1] > 160 and lm[2] > 160, lm
    assert rm[0] > 160 and rm[1] > 160 and rm[2] < 90, rm
    assert bm.max() < 60, bm


def test_cmyk_jpeg_image_renders(tmp_path):
    """Adobe CMYK JPEG (4-component DCTDecode with inverted channels) —
    PIL's PDF plugin is the independent producer."""
    from PIL import Image

    img = np.zeros((60, 90, 4), np.uint8)
    img[:, :45] = [255, 0, 0, 0]    # pure cyan
    img[:, 45:] = [0, 0, 255, 0]    # pure yellow
    pdf = tmp_path / "cmyk_jpeg.pdf"
    Image.fromarray(img, "CMYK").save(pdf, "PDF", resolution=72)
    assert b"DCTDecode" in pdf.read_bytes()
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    left = page[h // 4 : h // 2, : int(w * 0.4)].reshape(-1, 3).mean(0)
    right = page[h // 4 : h // 2, int(w * 0.6) :].reshape(-1, 3).mean(0)
    assert left[0] < 90 and left[1] > 150 and left[2] > 150, left    # cyan
    assert right[0] > 150 and right[1] > 150 and right[2] < 90, right  # yellow


def test_decode_array_inverts_gray(tmp_path):
    """/Decode [1 0]: per-component remap — a white-is-0 grayscale image
    must render inverted."""
    import zlib as _z

    w, h = 6, 4
    raw = bytes([0] * (w * h))  # all zeros; Decode [1 0] -> all WHITE
    data = _z.compress(raw)
    img = (
        b"<< /Type /XObject /Subtype /Image /Width 6 /Height 4"
        b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Decode [1 0]"
        b" /Filter /FlateDecode /Length " + str(len(data)).encode() + b" >>\n"
        b"stream\n" + data + b"\nendstream"
    )
    content = b"q 160 0 0 120 0 0 cm /Im1 Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
        img,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    from tests.test_raster_shading import _pdf

    pdf = _pdf(tmp_path / "decode.pdf", objs)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    assert page.mean() > 230, page.mean()  # inverted to white

    # Without Decode the same samples render black.
    objs[3] = img.replace(b" /Decode [1 0]", b"")
    pdf2 = _pdf(tmp_path / "decode2.pdf", objs)
    with PdfDocument(pdf2) as doc:
        page2 = doc.render_page(0, dpi=72)
    assert page2.mean() < 40, page2.mean()


def test_ccitt_g3_1d_image_renders(tmp_path):
    """Group 3 1-D (K=0, MH runs + EOLs): strip bytes from PIL's group3
    TIFF encoder embedded as a CCITTFaxDecode K=0 image."""
    from PIL import Image

    img = np.zeros((40, 64), np.uint8)
    img[10:30, 16:48] = 255
    tiff = tmp_path / "g3.tiff"
    Image.fromarray(img).convert("1").save(tiff, compression="group3")
    t = Image.open(tiff)
    off, cnt = t.tag_v2[273][0], t.tag_v2[279][0]
    strip = tiff.read_bytes()[off : off + cnt]

    imgobj = (
        b"<< /Type /XObject /Subtype /Image /Width 64 /Height 40"
        b" /ColorSpace /DeviceGray /BitsPerComponent 1"
        b" /Filter /CCITTFaxDecode /DecodeParms << /K 0 /Columns 64"
        b" /Rows 40 /BlackIs1 true >> /Length "
        + str(len(strip)).encode() + b" >>\nstream\n" + strip + b"\nendstream"
    )
    content = b"q 128 0 0 80 0 0 cm /Im1 Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 128 80]"
        b" /Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
        imgobj,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    from tests.test_raster_shading import _pdf

    pdf = _pdf(tmp_path / "g3.pdf", objs)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    inner = page[int(h * 0.35) : int(h * 0.6), int(w * 0.35) : int(w * 0.6)]
    corner = page[: int(h * 0.15), : int(w * 0.15)]
    assert inner.mean() > 200, inner.mean()
    assert corner.mean() < 60, corner.mean()


def test_progressive_jpeg_image_renders(tmp_path):
    """Progressive JPEG (SOF2: spectral selection + successive
    approximation) — PIL is both the independent encoder and the reference
    decoder; our engine must match its pixels closely."""
    from PIL import Image

    rng = np.random.default_rng(5)
    img = np.zeros((120, 180, 3), np.uint8)
    for x in range(180):
        img[:, x] = (x * 255 // 179, 60, 255 - x * 255 // 179)
    img[40:80, 60:120] = [10, 200, 10]
    pdf = tmp_path / "prog.pdf"
    Image.fromarray(img).save(
        pdf, "PDF", resolution=72, quality=92, progressive=True
    )
    assert b"\xff\xc2" in pdf.read_bytes()  # SOF2 frame
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    # Compare against PIL's own decode of the same JPEG.
    jpg = tmp_path / "prog.jpg"
    Image.fromarray(img).save(jpg, quality=92, progressive=True)
    ref = np.asarray(Image.open(jpg)).astype(int)
    got = page[: ref.shape[0], : ref.shape[1]].astype(int)
    err = np.abs(got - ref).mean()
    assert err < 6, err  # IDCT/rounding differences only


def test_progressive_jpeg_grayscale(tmp_path):
    from PIL import Image

    img = (np.arange(96 * 128).reshape(96, 128) % 256).astype(np.uint8)
    pdf = tmp_path / "pg.pdf"
    Image.fromarray(img, "L").save(
        pdf, "PDF", resolution=72, quality=90, progressive=True
    )
    assert b"\xff\xc2" in pdf.read_bytes()
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    jpg = tmp_path / "pg.jpg"
    Image.fromarray(img, "L").save(jpg, quality=90, progressive=True)
    ref = np.asarray(Image.open(jpg)).astype(int)
    got = page[: ref.shape[0], : ref.shape[1], 0].astype(int)
    assert np.abs(got - ref).mean() < 6

"""JPXDecode (JPEG 2000) image XObjects.

The reference rasterizes via Poppler, which carries openjpeg (reference
backend/Dockerfile:4-6), so JPX-compressed PDFs render for free there; this
engine is self-contained, so raster/cpp/jpx.h implements the codec (MQ
arithmetic decoder, EBCOT tier-1/2, tag trees, 5/3 + 9/7 inverse DWT,
RCT/ICT, tiles, quality layers).

Every fixture stream is produced by an INDEPENDENT encoder (PIL -> openjpeg),
and the reference pixels come from PIL's own decode of that stream, so the
decoder is validated against a real bitstream, not our own bytes.  Lossless
(5/3 reversible) decodes must be bit-exact; irreversible 9/7 gets a small
float-rounding tolerance.
"""

import io

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

try:  # openjpeg support is an optional PIL feature
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        io.BytesIO(), "JPEG2000"
    )
except Exception:  # pragma: no cover
    pytest.skip("PIL lacks JPEG 2000 support", allow_module_level=True)


def _build_pdf(path, jpx_bytes, w, h, cs=b"/DeviceRGB"):
    """One-page PDF drawing a /JPXDecode image XObject 1:1 at 72 dpi."""
    img = (
        b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
        + b" /Height " + str(h).encode()
        + b" /ColorSpace " + cs
        + b" /BitsPerComponent 8 /Filter /JPXDecode /Length "
        + str(len(jpx_bytes)).encode()
        + b" >>\nstream\n" + jpx_bytes + b"\nendstream"
    )
    content = (
        b"q " + str(w).encode() + b" 0 0 " + str(h).encode()
        + b" 0 0 cm /Im1 Do Q"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 " + str(w).encode()
        + b" " + str(h).encode()
        + b"] /Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
        img,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + o + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF\n"
    )
    path.write_bytes(bytes(out))


def _test_image():
    """Gradients + solid blocks: exercises all subbands and the MCT."""
    w, h = 120, 90
    img = np.zeros((h, w, 3), np.uint8)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img[..., 0] = (xx * 255 // (w - 1)).astype(np.uint8)
    img[..., 1] = (yy * 255 // (h - 1)).astype(np.uint8)
    img[..., 2] = ((xx + yy) % 256).astype(np.uint8)
    img[20:40, 30:60] = [255, 0, 0]
    img[50:70, 70:100] = [0, 0, 255]
    return img


def _roundtrip(tmp_path, arr, mode="RGB", **save_kw):
    """Encode with PIL/openjpeg, render via the PDF engine, return
    (engine_pixels, PIL_reference_pixels)."""
    pil = (
        Image.fromarray(arr)
        if arr.ndim == 3
        else Image.fromarray(arr, "L")
    )
    buf = io.BytesIO()
    pil.save(buf, "JPEG2000", **save_kw)
    jp2 = buf.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(jp2)).convert("RGB"))
    h, w = arr.shape[:2]
    cs = b"/DeviceRGB" if arr.ndim == 3 else b"/DeviceGray"
    pdf = tmp_path / "jpx.pdf"
    _build_pdf(pdf, jp2, w, h, cs=cs)
    with PdfDocument(pdf) as doc:
        assert doc.page_count == 1
        page = doc.render_page(0, dpi=72)
    return page[:h, :w].astype(int), ref.astype(int)


def test_rgb_lossless_bit_exact(tmp_path):
    """5/3 reversible + RCT: decode must match openjpeg bit-for-bit."""
    got, ref = _roundtrip(tmp_path, _test_image())
    assert np.abs(got - ref).max() == 0


def test_gray_lossless_bit_exact(tmp_path):
    got, ref = _roundtrip(tmp_path, _test_image()[:, :, 0])
    assert np.abs(got - ref).max() == 0


def test_rgb_irreversible_97(tmp_path):
    """9/7 float wavelet + ICT: small rounding tolerance vs openjpeg."""
    got, ref = _roundtrip(tmp_path, _test_image(), irreversible=True)
    d = np.abs(got - ref)
    assert d.max() <= 4 and d.mean() < 0.5, (d.max(), d.mean())


def test_multiple_tiles(tmp_path):
    """Tiled codestream: per-tile build/decode/stitch, still bit-exact."""
    got, ref = _roundtrip(tmp_path, _test_image(), tile_size=(64, 64))
    assert np.abs(got - ref).max() == 0


def test_rlcp_progression(tmp_path):
    got, ref = _roundtrip(tmp_path, _test_image(), progression="RLCP")
    assert np.abs(got - ref).max() == 0


def test_quality_layers(tmp_path):
    """Multi-layer codestream: tier-2 inclusion/Lblock state across
    layers; decoding all layers of a lossless stream is still exact."""
    got, ref = _roundtrip(
        tmp_path, _test_image(), quality_mode="rates",
        quality_layers=[40, 10, 2],
    )
    assert np.abs(got - ref).max() == 0


def test_raw_codestream_no_jp2(tmp_path):
    """PDF may embed a raw SOC..EOC codestream without the JP2 container."""
    buf = io.BytesIO()
    Image.fromarray(_test_image()).save(buf, "JPEG2000", no_jp2=True)
    jp2 = buf.getvalue()
    assert jp2[:2] == b"\xff\x4f"
    ref = np.asarray(Image.open(io.BytesIO(jp2)).convert("RGB"))
    pdf = tmp_path / "raw.pdf"
    h, w = ref.shape[:2]
    _build_pdf(pdf, jp2, w, h)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    assert np.abs(page[:h, :w].astype(int) - ref.astype(int)).max() == 0


def test_rgba_alpha_dropped(tmp_path):
    """4-component JP2 (RGB + opacity): engine keeps the color channels."""
    arr = _test_image()
    rgba = np.dstack([arr, np.full(arr.shape[:2], 200, np.uint8)])
    buf = io.BytesIO()
    Image.fromarray(rgba).save(buf, "JPEG2000")
    jp2 = buf.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(jp2)).convert("RGB"))
    pdf = tmp_path / "rgba.pdf"
    h, w = arr.shape[:2]
    _build_pdf(pdf, jp2, w, h)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    assert np.abs(page[:h, :w].astype(int) - ref.astype(int)).max() == 0


def test_corrupt_stream_blank_not_crash(tmp_path):
    """Truncated/garbage JPX leaves the page blank (graceful failure)."""
    buf = io.BytesIO()
    Image.fromarray(_test_image()).save(buf, "JPEG2000")
    jp2 = bytearray(buf.getvalue())[: len(buf.getvalue()) // 3]
    pdf = tmp_path / "bad.pdf"
    _build_pdf(pdf, bytes(jp2), 120, 90)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)  # must not crash
    assert page.shape[2] == 3

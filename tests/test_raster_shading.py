"""Axial/radial shading (`sh` operator) — the gradient fills Poppler renders
for the reference (LaTeX/tikz output uses ShadingType 2/3 with type-2/3
functions).  Hand-authored fixtures; assertions check gradient direction,
monotonicity and the W-clip bounding.
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


def _shading_pdf(path, shading, content):
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Resources << /Shading << /Sh0 4 0 R >> >> /Contents 5 0 R >>",
        shading,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    return _pdf(path, objs)


def test_axial_shading_black_to_white(tmp_path):
    pdf = _shading_pdf(
        tmp_path / "axial.pdf",
        b"<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 160 0]"
        b" /Extend [true true] /Function << /FunctionType 2 /Domain [0 1]"
        b" /C0 [0 0 0] /C1 [1 1 1] /N 1 >> >>",
        b"q 0 0 160 120 re W n /Sh0 sh Q",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    cols = gray[h // 3 : 2 * h // 3].mean(axis=0)
    assert cols[w // 16] < 40, cols[w // 16]          # left ~ black
    assert cols[-w // 16] > 215, cols[-w // 16]       # right ~ white
    mid = cols[w // 2]
    assert 90 < mid < 170, mid                        # linear middle
    # monotone non-decreasing left -> right (sampled)
    samples = cols[:: max(1, w // 16)]
    assert all(b >= a - 3 for a, b in zip(samples, samples[1:])), samples


def test_axial_shading_respects_clip(tmp_path):
    """Painting is bounded by the current clip (re W n idiom)."""
    pdf = _shading_pdf(
        tmp_path / "clip.pdf",
        b"<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 160 0]"
        b" /Extend [true true] /Function << /FunctionType 2 /Domain [0 1]"
        b" /C0 [0 0 0] /C1 [0 0 0] /N 1 >> >>",
        b"q 40 30 80 60 re W n /Sh0 sh Q",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    assert gray[h // 2, w // 2] < 40        # inside the clip: painted black
    assert gray[2, 2] > 230                 # outside: untouched white
    assert gray[h - 3, w - 3] > 230


def test_radial_shading_bullseye(tmp_path):
    pdf = _shading_pdf(
        tmp_path / "radial.pdf",
        b"<< /ShadingType 3 /ColorSpace /DeviceRGB"
        b" /Coords [80 60 0 80 60 70] /Extend [true true]"
        b" /Function << /FunctionType 2 /Domain [0 1]"
        b" /C0 [1 1 1] /C1 [0 0 0] /N 1 >> >>",
        b"q 0 0 160 120 re W n /Sh0 sh Q",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    center = gray[h // 2 - 3 : h // 2 + 3, w // 2 - 3 : w // 2 + 3].mean()
    corner = gray[:6, :6].mean()
    assert center > 215, center   # white core
    assert corner < 110, corner   # dark rim
    # radially monotone: brightness decreases with distance from center
    ring1 = gray[h // 2, w // 2 + w // 8]
    ring2 = gray[h // 2, w // 2 + w // 4]
    assert center >= ring1 >= ring2, (center, ring1, ring2)


def test_stitching_function_two_segments(tmp_path):
    """Type-3 stitching: black->white over [0,.5], white->black over [.5,1]."""
    pdf = _shading_pdf(
        tmp_path / "stitch.pdf",
        b"<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 160 0]"
        b" /Extend [true true] /Function << /FunctionType 3 /Domain [0 1]"
        b" /Functions [ << /FunctionType 2 /Domain [0 1] /C0 [0 0 0]"
        b" /C1 [1 1 1] /N 1 >> << /FunctionType 2 /Domain [0 1]"
        b" /C0 [1 1 1] /C1 [0 0 0] /N 1 >> ] /Bounds [0.5]"
        b" /Encode [0 1 0 1] >> >>",
        b"q 0 0 160 120 re W n /Sh0 sh Q",
    )
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    gray = page.mean(axis=2)
    h, w = gray.shape
    row = gray[h // 2]
    assert row[w // 16] < 50 and row[-w // 16] < 50     # ends dark
    assert row[w // 2] > 200, row[w // 2]               # middle bright


def test_inline_image_bi_id_ei(tmp_path):
    """Inline images (BI/ID/EI): 8-bpc RGB raw and a 1-bpc ImageMask
    painted with the current fill color."""
    import zlib as _z

    rgb = bytes()
    for y in range(4):
        for x in range(6):
            rgb += bytes((255, 0, 0) if x < 3 else (0, 0, 255))
    flate = _z.compress(rgb)
    content = (
        b"q 80 0 0 60 0 60 cm BI /W 6 /H 4 /BPC 8 /CS /RGB /F /Fl ID "
        + flate + b" EI Q\n"
        b"q 0.0 g 80 0 0 60 80 0 cm BI /W 8 /H 8 /BPC 1 /IM true ID "
        + bytes([0x0F] * 8) + b" EI Q"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    pdf = _pdf(tmp_path / "inline.pdf", objs)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    # Top-left quadrant: red | blue halves of the RGB inline image.
    tl = page[h // 8 : 3 * h // 8, : w // 4].reshape(-1, 3).mean(0)
    tr = page[h // 8 : 3 * h // 8, w // 4 : w // 2].reshape(-1, 3).mean(0)
    assert tl[0] > 150 and tl[2] < 90, tl    # red
    assert tr[2] > 150 and tr[0] < 90, tr    # blue
    # Bottom-right: mask bits 0 (left nibble) paint black, 1 stay white.
    bm_paint = page[5 * h // 8 : 7 * h // 8,
                    int(w * 0.52) : int(w * 0.70)].mean()
    bm_clear = page[5 * h // 8 : 7 * h // 8,
                    int(w * 0.80) : int(w * 0.95)].mean()
    assert bm_paint < 60, bm_paint
    assert bm_clear > 220, bm_clear


def test_ascii85_and_runlength_filters(tmp_path):
    """ASCII85Decode and RunLengthDecode content-stream filters."""
    import base64

    content = b"BT /F1 24 Tf 72 100 Td (Filter Test 85) Tj ET"
    a85 = base64.a85encode(content) + b"~>"
    rl = bytearray()
    for ch in content:  # trivial literal runs of 1
        rl += bytes((0, ch))
    rl.append(128)
    for name, data in (
        (b"/ASCII85Decode", bytes(a85)),
        (b"/RunLengthDecode", bytes(rl)),
    ):
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 200]"
            b" /Resources << /Font << /F1 << /Type /Font /Subtype /Type1"
            b" /BaseFont /Helvetica >> >> >> /Contents 4 0 R >>",
            b"<< /Filter " + name + b" /Length " + str(len(data)).encode()
            + b" >>\nstream\n" + data + b"\nendstream",
        ]
        pdf = _pdf(tmp_path / (name[1:].decode() + ".pdf"), objs)
        with PdfDocument(pdf) as doc:
            assert "Filter Test 85" in doc.extract_text(0), name
            page = doc.render_page(0, dpi=72)
        assert page.mean() < 255  # some ink rendered


def test_sampled_function_shading(tmp_path):
    """Type-0 (sampled) function: an 8-bit RGB ramp red -> green driven by
    a 5-sample stream with linear interpolation."""
    samples = bytes(
        b for i in range(5)
        for b in (255 - i * 63 if i < 4 else 3, i * 63 if i < 4 else 252, 0)
    )
    fn = (
        b"<< /FunctionType 0 /Domain [0 1] /Range [0 1 0 1 0 1]"
        b" /Size [5] /BitsPerSample 8 /Length "
        + str(len(samples)).encode() + b" >>\nstream\n" + samples
        + b"\nendstream"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 160 120]"
        b" /Resources << /Shading << /Sh0 4 0 R >> >> /Contents 6 0 R >>",
        b"<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 160 0]"
        b" /Extend [true true] /Function 5 0 R >>",
        fn,
        b"<< /Length 30 >>\nstream\nq 0 0 160 120 re W n /Sh0 sh Q\nendstream",
    ]
    pdf = _pdf(tmp_path / "sampled.pdf", objs)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    h, w = page.shape[:2]
    left = page[h // 2, w // 16]
    right = page[h // 2, -w // 16]
    mid = page[h // 2, w // 2]
    assert left[0] > 180 and left[1] < 80, left       # red end
    assert right[1] > 180 and right[0] < 80, right    # green end
    assert 80 < mid[0] < 190 and 60 < mid[1] < 190, mid  # interpolated


def test_lzw_filter_against_pil_encoder(tmp_path):
    """LZWDecode: strip bytes from PIL's tiff_lzw encoder embedded as an
    LZW image stream must decode back to the exact source pixels."""
    from PIL import Image

    src = (np.arange(64 * 48).reshape(48, 64) % 251).astype(np.uint8)
    tiff = tmp_path / "lzw.tiff"
    Image.fromarray(src).save(tiff, compression="tiff_lzw")
    t = Image.open(tiff)
    offs, cnts = t.tag_v2[273], t.tag_v2[279]
    raw = tiff.read_bytes()
    strip = b"".join(raw[o : o + c] for o, c in zip(offs, cnts))

    imgobj = (
        b"<< /Type /XObject /Subtype /Image /Width 64 /Height 48"
        b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /LZWDecode"
        b" /Length " + str(len(strip)).encode() + b" >>\nstream\n"
        + strip + b"\nendstream"
    )
    # 1:1 scale so the renderer's bilinear sampler hits source pixels
    # exactly and the comparison is pixel-precise.
    content = b"q 64 0 0 48 0 0 cm /Im1 Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 64 48]"
        b" /Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>",
        imgobj,
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    pdf = _pdf(tmp_path / "lzw.pdf", objs)
    with PdfDocument(pdf) as doc:
        page = doc.render_page(0, dpi=72)
    band_got = page[10:40, 10:54, 0].astype(int)
    band_src = src[10:40, 10:54].astype(int)
    assert np.abs(band_got - band_src).mean() < 2, (
        band_got[0, :6], band_src[0, :6]
    )

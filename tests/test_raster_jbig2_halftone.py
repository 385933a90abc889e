"""JBIG2 pattern dictionaries + halftone regions (T.88 6.6/6.7, Annex C)
and generic refinement regions (6.3) — the remaining JBIG2 region classes
Poppler decodes for the reference (VERDICT r4 missing item 4).

Same layered-validation style as tests/test_raster_jbig2.py: a Python
encoder written INDEPENDENTLY from the T.88 text (sharing only the spec's
context layouts) produces the streams; the C++ decoder must reproduce the
source bitmaps exactly through the full PDF render path.
"""

import struct

import numpy as np

from test_raster_jbig2 import (
    MQEncoder,
    NOMINAL_AT,
    _ctx_t0,
    _encode_generic_into,
    _render,
    _test_bitmap,
    build_pdf,
    encode_generic,
    generic_region_seg,
    page_info_seg,
    seg,
)


def _encode_generic_at(bitmap, at):
    """Template-0 generic coding with EXPLICIT AT pixels (pattern
    dictionaries pin AT1 = (-HDPW, 0), T.88 6.7.5)."""
    h, w = bitmap.shape
    enc = MQEncoder()

    def get(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return 0
        return int(bitmap[y, x])

    for y in range(h):
        for x in range(w):
            enc.encode(_ctx_t0(get, x, y, at), get(x, y))
    return enc.flush()


def _patterns(hdpw=4, hdph=4):
    """4 gray levels: empty, dot, checker, full."""
    p0 = np.zeros((hdph, hdpw), np.uint8)
    p1 = np.zeros_like(p0)
    p1[1:3, 1:3] = 1
    p2 = np.indices((hdph, hdpw)).sum(axis=0) % 2
    p3 = np.ones_like(p0)
    return [p0, p1, p2.astype(np.uint8), p3]


def pattern_dict_seg(num, pats):
    hdph, hdpw = pats[0].shape
    collective = np.concatenate(pats, axis=1)
    at = [-hdpw, 0, -3, -1, 2, -2, -2, -2]
    coded = _encode_generic_at(collective, at)
    data = bytes([0]) + bytes([hdpw, hdph]) + struct.pack(
        ">I", len(pats) - 1
    ) + coded
    return seg(num, 16, 1, data)


def halftone_region_seg(num, w, h, gray, pat_shape, ref, x=0, y=0):
    """Immediate halftone region: gray image `gray` (HGH x HGW) of pattern
    indices, grid vector = pattern size (contiguous tiling), OR combine."""
    hgh, hgw = gray.shape
    bpp = max(1, int(np.ceil(np.log2(gray.max() + 1))) if gray.max() else 1)
    # Annex C gray-code planes, MSB first, one shared MQ coder.
    enc = MQEncoder()
    for j in range(bpp - 1, -1, -1):
        plane = (gray >> j) & 1
        if j < bpp - 1:
            plane = plane ^ ((gray >> (j + 1)) & 1)
        _encode_generic_into(enc, plane.astype(np.uint8), tmpl=0)
    coded = enc.flush()
    hdph, hdpw = pat_shape
    data = struct.pack(">IIII", w, h, x, y) + bytes([0])  # region info, OR
    data += bytes([0])  # hflags: arithmetic, template 0, no skip, OR, 0
    data += struct.pack(">II", hgw, hgh)
    data += struct.pack(">ii", 0, 0)      # HGX, HGY
    data += struct.pack(">HH", hdpw << 8, 0)  # HRX (8-bit fixed), HRY
    return seg(num, 22, 1, data + coded, refs=(ref,))


def _expected_halftone(w, h, gray, pats):
    out = np.zeros((h, w), np.uint8)
    hdph, hdpw = pats[0].shape
    for m in range(gray.shape[0]):
        for n in range(gray.shape[1]):
            x, y = n * hdpw, m * hdph
            p = pats[gray[m, n]]
            ys, xs = min(hdph, h - y), min(hdpw, w - x)
            if ys > 0 and xs > 0:
                out[y:y + ys, x:x + xs] |= p[:ys, :xs]
    return out


def test_halftone_region_roundtrip(tmp_path):
    pats = _patterns()
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 4, size=(12, 20), dtype=np.uint8)
    w, h = 20 * 4, 12 * 4
    data = (
        page_info_seg(0, w, h)
        + pattern_dict_seg(1, pats)
        + halftone_region_seg(2, w, h, gray, pats[0].shape, ref=1)
    )
    pdf = tmp_path / "halftone.pdf"
    build_pdf(pdf, data, w, h)
    page = _render(pdf)
    expected = _expected_halftone(w, h, gray, pats)
    got = (page[:h, :w, 0] < 128).astype(np.uint8)
    assert (got == expected).all(), (
        f"halftone mismatch: {np.abs(got.astype(int) - expected).sum()} px"
    )


# ---------------------------------------------------------------------------
# Generic refinement regions
# ---------------------------------------------------------------------------

# Refinement context layouts — MUST mirror RefinementDecoder in
# raster/cpp/jbig2.h (coding pixels MSB-first, then reference pixels,
# AT pixels appended per template figure).
def _rctx(cget, rget, x, y, tmpl, at):
    if tmpl == 0:
        cod = [(0, -1), (1, -1), (-1, 0), (at[0], at[1])]
        ref = [(0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1),
               (1, 1), (at[2], at[3])]
    else:
        cod = [(-1, -1), (0, -1), (1, -1), (-1, 0)]
        ref = [(0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)]
    v = 0
    for ox, oy in cod:
        v = (v << 1) | cget(x + ox, y + oy)
    for ox, oy in ref:
        v = (v << 1) | rget(x + ox, y + oy)
    return v


def encode_refinement(target, reference, tmpl=0):
    h, w = target.shape
    at = [-1, -1, -1, -1]
    enc = MQEncoder()

    def cget(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return 0
        return int(target[y, x])

    def rget(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return 0
        return int(reference[y, x])

    for y in range(h):
        for x in range(w):
            enc.encode(_rctx(cget, rget, x, y, tmpl, at), cget(x, y))
    return enc.flush(), at


def refinement_region_seg(num, w, h, target, reference, tmpl=0, x=0, y=0):
    coded, at = encode_refinement(target, reference, tmpl)
    data = struct.pack(">IIII", w, h, x, y) + bytes([0])
    data += bytes([tmpl])  # refinement flags: template, TPGRON off
    if tmpl == 0:
        data += bytes(b & 0xFF for b in at)
    return seg(num, 42, 1, data + coded)


def test_refinement_region_roundtrip(tmp_path):
    base = _test_bitmap()
    h, w = base.shape
    # Target: base with a block cleared and a new block set — the
    # refinement must REPLACE the page region with exactly this.
    target = base.copy()
    target[8:12, 8:40] = 0
    target[40:46, 30:60] = 1
    for tmpl in (0, 1):
        data = (
            page_info_seg(0, w, h)
            + generic_region_seg(1, w, h, encode_generic(base, tmpl=0))
            + refinement_region_seg(2, w, h, target, base, tmpl=tmpl)
        )
        pdf = tmp_path / f"refine_t{tmpl}.pdf"
        build_pdf(pdf, data, w, h)
        page = _render(pdf)
        got = (page[:h, :w, 0] < 128).astype(np.uint8)
        assert (got == target).all(), (
            f"template {tmpl}: {np.abs(got.astype(int) - target).sum()} px"
        )


def test_refinement_subregion(tmp_path):
    """Refinement of a SUB-rectangle leaves the rest of the page alone."""
    base = _test_bitmap()
    h, w = base.shape
    sub = base[16:48, 24:72].copy()
    target_sub = sub ^ (np.indices(sub.shape).sum(axis=0) % 7 == 0)
    data = (
        page_info_seg(0, w, h)
        + generic_region_seg(1, w, h, encode_generic(base, tmpl=0))
        + refinement_region_seg(2, sub.shape[1], sub.shape[0],
                                target_sub.astype(np.uint8), sub, x=24, y=16)
    )
    pdf = tmp_path / "refine_sub.pdf"
    build_pdf(pdf, data, w, h)
    page = _render(pdf)
    got = (page[:h, :w, 0] < 128).astype(np.uint8)
    expected = base.copy()
    expected[16:48, 24:72] = target_sub
    assert (got == expected).all(), (
        f"{np.abs(got.astype(int) - expected).sum()} px differ"
    )

"""JBIG2Decode image XObjects (raster/cpp/jbig2.h) — the bilevel codec of
scanned-document PDFs (Poppler gives the reference this for free).

No JBIG2 encoder exists in this environment, so validation is layered:
- The MMR fixture wraps PIL's OWN CCITT G4 bitstream (an independent
  encoder, already validating ccitt.h) in JBIG2 segment headers — the
  entropy-coded bytes are externally produced, only the segment framing
  is ours.
- The arithmetic fixtures are produced by a Python MQ encoder written
  from the T.88 flowcharts in this file, decoded by the C++ MQ decoder
  (itself validated against openjpeg via the JPX tests).  Encoder and
  decoder share only the spec.
"""

import re
import struct

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument

# ---------------------------------------------------------------------------
# MQ arithmetic ENCODER (ITU-T T.88 Annex E flowcharts)
# ---------------------------------------------------------------------------

QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQEncoder:
    def __init__(self):
        self.buf = bytearray([0])  # scratch byte at start-1
        self.bp = 0
        self.c = 0
        self.a = 0x8000
        self.ct = 12
        self.cx = {}

    def _setb(self, v):
        if self.bp == len(self.buf):
            self.buf.append(v & 0xFF)
        else:
            self.buf[self.bp] = v & 0xFF

    def _byteout(self):
        if self.buf[self.bp] == 0xFF:
            self.bp += 1
            self._setb(self.c >> 20)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.bp += 1
            self._setb(self.c >> 19)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.buf[self.bp] += 1
            if self.buf[self.bp] == 0xFF:
                self.c &= 0x7FFFFFF
                self.bp += 1
                self._setb(self.c >> 20)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.bp += 1
                self._setb(self.c >> 19)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self):
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def encode(self, ctx, d):
        i, mps = self.cx.get(ctx, (0, 0))
        qe, nmps, nlps, sw = QE[i]
        self.a -= qe
        if d == mps:  # CODEMPS
            if self.a & 0x8000:
                self.c += qe
            else:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.cx[ctx] = (nmps, mps)
                self._renorm()
        else:  # CODELPS
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            self.cx[ctx] = (nlps, mps ^ 1 if sw else mps)
            self._renorm()

    def flush(self):
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        end = self.bp + 1 if self.buf[self.bp] != 0xFF else self.bp
        return bytes(self.buf[1:end])


# Template context layouts — MUST mirror raster/cpp/jbig2.h exactly.
def _ctx_t0(get, x, y, at):
    return (
        (get(x - 1, y) << 0) | (get(x - 2, y) << 1) | (get(x - 3, y) << 2)
        | (get(x - 4, y) << 3) | (get(x + at[0], y + at[1]) << 4)
        | (get(x + 2, y - 1) << 5) | (get(x + 1, y - 1) << 6)
        | (get(x, y - 1) << 7) | (get(x - 1, y - 1) << 8)
        | (get(x - 2, y - 1) << 9) | (get(x + at[2], y + at[3]) << 10)
        | (get(x + at[4], y + at[5]) << 11) | (get(x + 1, y - 2) << 12)
        | (get(x, y - 2) << 13) | (get(x - 1, y - 2) << 14)
        | (get(x + at[6], y + at[7]) << 15)
    )


def _ctx_t2(get, x, y, at):
    return (
        (get(x - 1, y) << 0) | (get(x - 2, y) << 1)
        | (get(x + at[0], y + at[1]) << 2) | (get(x + 1, y - 1) << 3)
        | (get(x, y - 1) << 4) | (get(x - 1, y - 1) << 5)
        | (get(x - 2, y - 1) << 6) | (get(x + 1, y - 2) << 7)
        | (get(x, y - 2) << 8) | (get(x - 1, y - 2) << 9)
    )


TPGD_CTX = {0: 0x9B25, 2: 0x00E5}
NOMINAL_AT = {0: [3, -1, -3, -1, 2, -2, -2, -2], 2: [2, -1, 0, 0, 0, 0, 0, 0]}


def encode_generic(bitmap, tmpl=0, tpgdon=False):
    """Arithmetic generic-region coded data (T.88 6.2) for `bitmap`."""
    h, w = bitmap.shape
    enc = MQEncoder()
    at = NOMINAL_AT[tmpl]
    ctx_fn = {0: _ctx_t0, 2: _ctx_t2}[tmpl]

    def get(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return 0
        return int(bitmap[y, x])

    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = y > 0 and bool((bitmap[y] == bitmap[y - 1]).all())
            enc.encode(TPGD_CTX[tmpl], 1 if typical != bool(ltp) else 0)
            if typical != bool(ltp):
                ltp ^= 1
            if ltp:
                continue
        for x in range(w):
            enc.encode(ctx_fn(get, x, y, at), get(x, y))
    return enc.flush()


# ---------------------------------------------------------------------------
# JBIG2 segment framing (PDF embedded organization) + PDF wrapper
# ---------------------------------------------------------------------------

def seg(num, stype, page, data, refs=()):
    out = struct.pack(">IB", num, stype)
    out += bytes([len(refs) << 5])
    out += bytes(refs)  # 1-byte referred numbers (all seg numbers small)
    out += bytes([page])
    out += struct.pack(">I", len(data))
    return out + data


def page_info_seg(num, w, h, default_pixel=0):
    data = struct.pack(">IIII", w, h, 0, 0)
    data += bytes([default_pixel << 2])
    data += struct.pack(">H", 0)  # striping info
    return seg(num, 48, 1, data)


def generic_region_seg(num, w, h, coded, tmpl=0, tpgdon=False, mmr=False,
                       x=0, y=0, op=0):
    data = struct.pack(">IIII", w, h, x, y) + bytes([op])
    gflags = (1 if mmr else 0) | (tmpl << 1) | (8 if tpgdon else 0)
    data += bytes([gflags])
    if not mmr:
        at = NOMINAL_AT[tmpl]
        nat = 4 if tmpl == 0 else 1
        data += bytes(b & 0xFF for b in at[: 2 * nat])
    return seg(num, 38, 1, data + coded)


def build_pdf(path, jbig2_data, w, h, globals_data=None):
    parms = b"<< >>"
    extra = []
    if globals_data is not None:
        parms = b"<< /JBIG2Globals 6 0 R >>"
        extra = [
            b"<< /Length " + str(len(globals_data)).encode()
            + b" >>\nstream\n" + globals_data + b"\nendstream"
        ]
    img = (
        b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
        + b" /Height " + str(h).encode()
        + b" /ColorSpace /DeviceGray /BitsPerComponent 1"
        + b" /Filter /JBIG2Decode /DecodeParms " + parms
        + b" /Length " + str(len(jbig2_data)).encode()
        + b" >>\nstream\n" + jbig2_data + b"\nendstream"
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
    ] + extra
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


def _test_bitmap(w=96, h=64):
    """Text-like structure: bars, a box outline, and a dotted region."""
    bm = np.zeros((h, w), np.uint8)
    bm[8:12, 8:88] = 1
    bm[20:24, 8:60] = 1
    bm[32:52, 10:14] = 1
    bm[32:52, 70:74] = 1
    bm[32:36, 10:74] = 1
    bm[48:52, 10:74] = 1
    bm[56:60, 8:88:4] = 1
    return bm


def _render(path):
    with PdfDocument(path) as doc:
        assert doc.page_count == 1
        return doc.render_page(0, dpi=72)


def _assert_matches(page, bm):
    h, w = bm.shape
    got_black = (page[:h, :w, 0] < 128).astype(np.uint8)
    assert (got_black == bm).all(), (
        f"mismatch: {np.abs(got_black.astype(int) - bm).sum()} px differ"
    )


def test_arithmetic_template0(tmp_path):
    bm = _test_bitmap()
    h, w = bm.shape
    data = page_info_seg(0, w, h) + generic_region_seg(
        1, w, h, encode_generic(bm, tmpl=0)
    )
    pdf = tmp_path / "t0.pdf"
    build_pdf(pdf, data, w, h)
    _assert_matches(_render(pdf), bm)


def test_arithmetic_template2_tpgdon(tmp_path):
    """Template 2 with typical-prediction rows (solid bands repeat rows)."""
    bm = _test_bitmap()
    h, w = bm.shape
    data = page_info_seg(0, w, h) + generic_region_seg(
        2, w, h, encode_generic(bm, tmpl=2, tpgdon=True), tmpl=2, tpgdon=True
    )
    pdf = tmp_path / "t2.pdf"
    build_pdf(pdf, data, w, h)
    _assert_matches(_render(pdf), bm)


def test_globals_stream(tmp_path):
    """Page info arrives via /JBIG2Globals; the image stream has only the
    region segment (the PDF two-stream organization)."""
    bm = _test_bitmap()
    h, w = bm.shape
    glob = page_info_seg(0, w, h)
    data = generic_region_seg(1, w, h, encode_generic(bm, tmpl=0))
    pdf = tmp_path / "glob.pdf"
    build_pdf(pdf, data, w, h, globals_data=glob)
    _assert_matches(_render(pdf), bm)


def test_mmr_region_from_pil_g4(tmp_path):
    """MMR generic region whose coded bytes come from PIL's G4 encoder —
    independently produced entropy data inside our segment framing."""
    from PIL import Image

    bm = _test_bitmap()
    h, w = bm.shape
    pil_pdf = tmp_path / "g4.pdf"
    Image.fromarray((bm * 255).astype(np.uint8)).convert("1").save(
        pil_pdf, "PDF", resolution=72
    )
    raw = pil_pdf.read_bytes()
    assert b"CCITTFaxDecode" in raw
    m = re.search(rb"stream\r?\n(.*?)\r?\nendstream", raw, re.S)
    g4 = m.group(1)
    data = page_info_seg(0, w, h) + generic_region_seg(
        1, w, h, g4, mmr=True
    )
    pdf = tmp_path / "mmr.pdf"
    build_pdf(pdf, data, w, h)
    _assert_matches(_render(pdf), bm)


def test_unsupported_halftone_region_blank_not_crash(tmp_path):
    """A pattern-dictionary segment (halftone organization, unsupported)
    leaves the page blank."""
    bm = _test_bitmap()
    h, w = bm.shape
    data = page_info_seg(0, w, h) + seg(1, 16, 1, b"\x00" * 8)
    pdf = tmp_path / "halftone.pdf"
    build_pdf(pdf, data, w, h)
    page = _render(pdf)  # must not crash
    assert (page > 200).mean() > 0.95  # blank


def test_mq_encoder_roundtrip_random():
    """The Python MQ encoder and the C++ MQ decoder share only T.88: a
    random decision stream over a few contexts must round-trip exactly
    (exercised through a full-page random-ish bitmap)."""
    rng = np.random.default_rng(7)
    bm = (rng.random((40, 56)) < 0.3).astype(np.uint8)
    h, w = bm.shape
    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp(prefix="vcp_jbig2_"))
    data = page_info_seg(0, w, h) + generic_region_seg(
        1, w, h, encode_generic(bm, tmpl=0)
    )
    pdf = tmp / "rand.pdf"
    build_pdf(pdf, data, w, h)
    _assert_matches(_render(pdf), bm)


# ---------------------------------------------------------------------------
# Symbol dictionary + text region (T.88 6.4/6.5 + Annex A integer coding)
# ---------------------------------------------------------------------------

OOB = "OOB"


def _encode_int(enc, proc, v):
    """IAx integer encoding (T.88 Annex A.2, encoder side).  Context keys
    are (proc, PREV) tuples so each statistical class has its own tree."""
    prev = 1

    def bit(b):
        nonlocal prev
        enc.encode((proc, prev), b)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)

    def bits(val, k):
        for i in range(k - 1, -1, -1):
            bit((val >> i) & 1)

    if v == OOB:
        bit(1)        # sign
        bit(0)        # first band
        bits(0, 2)    # value 0 with negative sign = OOB
        return
    s = 1 if v < 0 else 0
    va = abs(v)
    bit(s)
    if va <= 3:
        bit(0); bits(va, 2)
    elif va <= 19:
        bit(1); bit(0); bits(va - 4, 4)
    elif va <= 83:
        bit(1); bit(1); bit(0); bits(va - 20, 6)
    elif va <= 339:
        bit(1); bit(1); bit(1); bit(0); bits(va - 84, 8)
    elif va <= 4435:
        bit(1); bit(1); bit(1); bit(1); bit(0); bits(va - 340, 12)
    else:
        bit(1); bit(1); bit(1); bit(1); bit(1); bits(va - 4436, 32)


def _encode_iaid(enc, symcodelen, sym_id):
    """IAID encoding (A.3): symcodelen bits MSB-first through a PREV tree."""
    prev = 1
    for i in range(symcodelen - 1, -1, -1):
        b = (sym_id >> i) & 1
        enc.encode(("iaid", prev), b)
        prev = (prev << 1) | b


def _encode_generic_into(enc, bitmap, tmpl=0):
    """Generic-region coding of one symbol bitmap into an ALREADY-OPEN
    MQ encoder with persistent contexts (symbol dictionaries share one
    coder across all symbols, T.88 6.5.8.1)."""
    h, w = bitmap.shape
    at = NOMINAL_AT[tmpl]
    ctx_fn = {0: _ctx_t0, 2: _ctx_t2}[tmpl]

    def get(x, y):
        if x < 0 or y < 0 or x >= w or y >= h:
            return 0
        return int(bitmap[y, x])

    for y in range(h):
        for x in range(w):
            enc.encode(ctx_fn(get, x, y, at), get(x, y))


def encode_symbol_dict_seg(num, symbols, page=1, tmpl=0):
    """Symbol dictionary segment (type 0): arithmetic, no refinement,
    exporting every symbol.  Symbols must arrive sorted by height (the
    spec's height-class order) so decoded IDs equal input indices."""
    heights = [bm.shape[0] for bm in symbols]
    assert heights == sorted(heights), "symbols must be height-sorted"
    enc = MQEncoder()
    by_height = {}
    for i, bm in enumerate(symbols):
        by_height.setdefault(bm.shape[0], []).append(bm)
    hc = 0
    for height in sorted(by_height):
        _encode_int(enc, "iadh", height - hc)
        hc = height
        symwidth = 0
        for bm in by_height[height]:
            _encode_int(enc, "iadw", bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            _encode_generic_into(enc, bm, tmpl=tmpl)
        _encode_int(enc, "iadw", OOB)  # end of height class
    # Export runs: skip 0, export all (the dictionary's own order is the
    # height-class order, which is how the decoder indexes them).
    _encode_int(enc, "iaex", 0)
    _encode_int(enc, "iaex", len(symbols))
    coded = enc.flush()
    flags = (tmpl & 3) << 10  # SDHUFF=0, SDREFAGG=0
    data = struct.pack(">H", flags)
    at = NOMINAL_AT[tmpl]
    nat = 4 if tmpl == 0 else 1
    data += bytes(b & 0xFF for b in at[: 2 * nat])
    data += struct.pack(">II", len(symbols), len(symbols))
    return seg(num, 0, page, data + coded)


def _symcodelen(nsyms):
    k = 1
    while (1 << k) < nsyms:
        k += 1
    return k


def encode_text_region_seg(num, w, h, placements, symbols, refs,
                           ref_corner=1, page=1, x=0, y=0, ext_op=0,
                           ds_offset=0):
    """Immediate text region (type 6): arithmetic, strips=1, no refinement.

    placements: list of (s, t, sym_id), grouped by t ascending and s
    ascending within each t; placement bookkeeping mirrors T.88 6.4.5
    (left/top corners advance CURS after drawing by width-1)."""
    enc = MQEncoder()
    symcodelen = _symcodelen(len(symbols))
    strips = 1
    by_t = {}
    for s, t, sid in placements:
        by_t.setdefault(t, []).append((s, sid))
    _encode_int(enc, "iadt", 0)  # STRIPT init -> 0
    stript = 0
    firsts = 0
    for t in sorted(by_t):
        _encode_int(enc, "iadt", t - stript)
        stript = t
        first = True
        curs = 0
        for s, sid in sorted(by_t[t]):
            wi = symbols[sid].shape[1]
            if first:
                _encode_int(enc, "iafs", s - firsts)
                firsts = s
                curs = s
                first = False
            else:
                _encode_int(enc, "iads", s - curs - ds_offset)
                curs = s
            # strips == 1: no IAIT
            _encode_iaid(enc, symcodelen, sid)
            if ref_corner in (0, 1):  # left corners advance after drawing
                curs += wi - 1
        _encode_int(enc, "iads", OOB)  # end of strip
    coded = enc.flush()
    tflags = (ref_corner & 3) << 4 | ((ds_offset & 0x1F) << 10)
    data = struct.pack(">IIIIB", w, h, x, y, ext_op)
    data += struct.pack(">H", tflags)
    data += struct.pack(">I", len(placements))
    return seg(num, 6, page, data + coded, refs=refs)


def _letter_symbols():
    """Three letter-like symbols with distinct sizes and shapes, in
    height-class (ascending height) order."""
    c = np.zeros((8, 8), np.uint8)     # checker-ish
    c[::2, ::2] = 1; c[1::2, 1::2] = 1
    a = np.zeros((12, 10), np.uint8)   # box
    a[0:2, :] = 1; a[-2:, :] = 1; a[:, 0:2] = 1; a[:, -2:] = 1
    b = np.zeros((12, 6), np.uint8)    # vertical bar with serif
    b[:, 2:4] = 1; b[0:2, :] = 1
    return [c, a, b]


def _compose_expected(w, h, placements, symbols, ref_corner=1):
    page = np.zeros((h, w), np.uint8)
    for s, t, sid in placements:
        bm = symbols[sid]
        hh, ww = bm.shape
        x0 = s if ref_corner in (0, 1) else s - ww + 1
        y0 = t if ref_corner in (1, 3) else t - hh + 1
        page[y0 : y0 + hh, x0 : x0 + ww] |= bm
    return page


def test_symbol_text_region_roundtrip(tmp_path):
    """Symbol dictionary + text region (the dominant scanned-PDF JBIG2
    organization): a 'word' of three symbols placed on two lines decodes
    pixel-exactly."""
    syms = _letter_symbols()
    w, h = 120, 60
    placements = [
        (8, 6, 0), (22, 6, 1), (32, 6, 2), (44, 6, 0),
        (8, 30, 2), (20, 30, 1), (30, 30, 0),
    ]
    data = (
        page_info_seg(0, w, h)
        + encode_symbol_dict_seg(1, syms)
        + encode_text_region_seg(2, w, h, placements, syms, refs=[1])
    )
    pdf = tmp_path / "symtext.pdf"
    build_pdf(pdf, data, w, h)
    _assert_matches(_render(pdf), _compose_expected(w, h, placements, syms))


def test_symbol_dict_in_globals(tmp_path):
    """The dictionary arrives via /JBIG2Globals (how multi-page scanned
    PDFs share one dictionary); the page stream has only the text region."""
    syms = _letter_symbols()
    w, h = 96, 40
    placements = [(10, 8, 0), (26, 8, 2), (40, 8, 1)]
    glob = encode_symbol_dict_seg(1, syms, page=0)
    data = page_info_seg(2, w, h) + encode_text_region_seg(
        3, w, h, placements, syms, refs=[1]
    )
    pdf = tmp_path / "symglob.pdf"
    build_pdf(pdf, data, w, h, globals_data=glob)
    _assert_matches(_render(pdf), _compose_expected(w, h, placements, syms))


def test_text_region_bottomleft_corner(tmp_path):
    """REFCORNER=BOTTOMLEFT places symbols by their bottom edge."""
    syms = _letter_symbols()
    w, h = 80, 40
    placements = [(6, 24, 0), (24, 24, 1), (36, 24, 2)]
    data = (
        page_info_seg(0, w, h)
        + encode_symbol_dict_seg(1, syms)
        + encode_text_region_seg(2, w, h, placements, syms, refs=[1],
                                 ref_corner=0)
    )
    pdf = tmp_path / "bl.pdf"
    build_pdf(pdf, data, w, h)
    _assert_matches(
        _render(pdf), _compose_expected(w, h, placements, syms, ref_corner=0)
    )


def test_malformed_symbol_dict_blank_not_crash(tmp_path):
    """A truncated symbol dictionary fails gracefully -> blank page."""
    bm = _test_bitmap()
    h, w = bm.shape
    data = page_info_seg(0, w, h) + seg(1, 0, 1, b"\x00" * 8)
    pdf = tmp_path / "badsym.pdf"
    build_pdf(pdf, data, w, h)
    page = _render(pdf)  # must not crash
    assert (page > 200).mean() > 0.95  # blank

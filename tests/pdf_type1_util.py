"""Independent Type1 (/FontFile) font builder for engine tests.

Implements the Adobe Type 1 Font Format spec directly in Python — eexec /
charstring encryption (chapter 7), Type1 charstring assembly (chapter 6),
and the PFA-style program layout (chapter 2) — sharing no code with the
C++ decoder under test (raster/cpp/type1.h).  Glyph outlines come from
DejaVu Sans via fontTools (quadratic TrueType contours converted to the
cubic beziers Type1 requires), so rendering can be cross-checked against
the engine's independent TrueType rasterizer on the same shapes.

The generated program is additionally validated against fontTools' own
Type1 machinery (fontTools.misc.eexec + psCharStrings.T1CharString) in
tests/test_raster_type1.py — two independent readers of this writer.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

Point = Tuple[float, float]

C1, C2 = 52845, 22719


def t1_encrypt(plain: bytes, r: int) -> bytes:
    out = bytearray()
    for p in plain:
        c = p ^ (r >> 8)
        out.append(c)
        r = ((c + r) * C1 + C2) & 0xFFFF
    return bytes(out)


def charstring_encrypt(plain: bytes, leniv: int = 4) -> bytes:
    return t1_encrypt(b"\x00" * leniv + plain, 4330)


def eexec_encrypt(plain: bytes) -> bytes:
    """eexec with 4 lead bytes chosen so the ciphertext does not start with
    four hex digits (the spec's binary-vs-hex disambiguation rule)."""
    for lead0 in range(256):
        out = t1_encrypt(bytes([lead0, 0x42, 0x42, 0x42]) + plain, 55665)
        if not all(chr(b) in "0123456789abcdefABCDEF" for b in out[:4]):
            return out
    raise AssertionError("unreachable: some lead byte must break hex form")


def _num(v: float) -> bytes:
    v = int(round(v))
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    return b"\xff" + int(v).to_bytes(4, "big", signed=True)


# Type1 charstring operator bytes.
HSBW, CLOSEPATH, ENDCHAR = bytes([13]), bytes([9]), bytes([14])
RMOVETO, RLINETO, RRCURVETO = bytes([21]), bytes([5]), bytes([8])
CALLSUBR, ESCAPE = bytes([10]), bytes([12])
DIV = ESCAPE + bytes([12])
CALLOTHERSUBR, POP = ESCAPE + bytes([16]), ESCAPE + bytes([17])
SEAC = ESCAPE + bytes([6])
SETCURRENTPOINT = ESCAPE + bytes([33])


def _qcurves_to_cubics(p0: Point, pts: Sequence[Point]) -> List[Tuple[Point, Point, Point]]:
    """TrueType qCurveTo segment -> cubic beziers (exact degree elevation)."""
    *offs, end = pts
    cubics = []
    cur = p0
    for i, q in enumerate(offs):
        nxt = end if i == len(offs) - 1 else (
            (q[0] + offs[i + 1][0]) / 2.0, (q[1] + offs[i + 1][1]) / 2.0)
        c1 = (cur[0] + 2.0 / 3.0 * (q[0] - cur[0]),
              cur[1] + 2.0 / 3.0 * (q[1] - cur[1]))
        c2 = (nxt[0] + 2.0 / 3.0 * (q[0] - nxt[0]),
              nxt[1] + 2.0 / 3.0 * (q[1] - nxt[1]))
        cubics.append((c1, c2, nxt))
        cur = nxt
    return cubics


def contours_from_ttf_glyph(glyph_set, name: str) -> List[List]:
    """Draw a fontTools glyph into segment records:
    [("move", pt), ("line", pt), ("curve", c1, c2, pt), ("close",)]."""
    from fontTools.pens.basePen import BasePen

    segs: List[Tuple] = []

    class Rec(BasePen):
        def _moveTo(self, pt):
            segs.append(("move", pt))

        def _lineTo(self, pt):
            segs.append(("line", pt))

        def _curveToOne(self, c1, c2, pt):
            segs.append(("curve", c1, c2, pt))

        def _qCurveToOne(self, q, pt):
            cur = self._getCurrentPoint()
            for c1, c2, end in _qcurves_to_cubics(cur, [q, pt]):
                segs.append(("curve", c1, c2, end))

        def _closePath(self):
            segs.append(("close",))

    glyph_set[name].draw(Rec(glyph_set))
    return segs


def charstring_from_segments(segs, width: float, sbx: float = 0.0) -> bytes:
    """Assemble a Type1 charstring (relative ops, hsbw prologue)."""
    out = bytearray(_num(sbx) + _num(width) + HSBW)
    x, y = sbx, 0.0

    def rel(pt):
        nonlocal x, y
        dx, dy = pt[0] - x, pt[1] - y
        # Integer-quantized deltas: advance by the QUANTIZED amount so
        # rounding never accumulates across a contour.
        dxi, dyi = int(round(dx)), int(round(dy))
        x, y = x + dxi, y + dyi
        return dxi, dyi

    for seg in segs:
        if seg[0] == "move":
            dx, dy = rel(seg[1])
            out += _num(dx) + _num(dy) + RMOVETO
        elif seg[0] == "line":
            dx, dy = rel(seg[1])
            out += _num(dx) + _num(dy) + RLINETO
        elif seg[0] == "curve":
            d1 = rel(seg[1])
            d2 = rel(seg[2])
            d3 = rel(seg[3])
            out += b"".join(_num(v) for v in (*d1, *d2, *d3)) + RRCURVETO
        elif seg[0] == "close":
            out += CLOSEPATH
    out += ENDCHAR
    return bytes(out)


def flex_charstring(width: float) -> bytes:
    """A glyph whose top edge is drawn with the OtherSubrs flex protocol
    (othersubr 1/2/2.../0 + pop pop setcurrentpoint), exercising the
    interpreter's flex path.  Shape: a 600x400 slab whose top edge bulges
    via two gentle beziers (depth 20 units)."""
    out = bytearray(_num(0) + _num(width) + HSBW)
    #  (50,50) -> (650,50) -> (650,450), then flex back to (50,450) -> close
    out += _num(50) + _num(50) + RMOVETO
    out += _num(600) + _num(0) + RLINETO
    out += _num(0) + _num(400) + RLINETO
    # flex: reference point + 6 bezier points, all via "othersubr-collected"
    # rmoveto calls.  Current point: (650, 450); endpoint (50, 450).
    pts = [
        (350, 470),           # reference (ignored for geometry)
        (550, 470), (450, 470), (350, 450),   # bezier 1: c1 c2 end
        (250, 430), (150, 430), (50, 450),    # bezier 2: c1 c2 end
    ]
    out += _num(0) + _num(1) + CALLOTHERSUBR  # flex start: 0 args, subr 1
    cx, cy = 650.0, 450.0
    for px, py in pts:
        out += _num(px - cx) + _num(py - cy) + RMOVETO
        out += _num(0) + _num(2) + CALLOTHERSUBR  # flex progress
        cx, cy = px, py
    # flex end: "flexheight x y 3 0 callothersubr" then the endpoint comes
    # back via two pops for setcurrentpoint.
    out += _num(50) + _num(50) + _num(450) + _num(3) + _num(0) + CALLOTHERSUBR
    out += POP + POP + SETCURRENTPOINT
    out += _num(0) + _num(0) + RLINETO  # no-op, keeps contour open state sane
    out += CLOSEPATH + ENDCHAR
    return bytes(out)


def build_type1(
    charstrings: Dict[str, bytes],
    encoding: Dict[int, str],
    font_name: str = "VcpType1Fixture",
    subrs: Sequence[bytes] = (),
    hex_eexec: bool = False,
) -> Tuple[bytes, int, int]:
    """Assemble the full /FontFile program (cleartext + eexec portion).

    Returns (font_bytes, length1, length2): the PDF stream payload and its
    /Length1 /Length2 values."""
    enc_lines = "\n".join(
        f"dup {code} /{name} put" for code, name in sorted(encoding.items())
    )
    clear = (
        f"%!PS-AdobeFont-1.0: {font_name} 001.001\n"
        f"/FontName /{font_name} def\n"
        "/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
        "/FontType 1 def\n"
        "/FontBBox {-100 -300 1200 1000} readonly def\n"
        "/Encoding 256 array\n"
        "0 1 255 {1 index exch /.notdef put} for\n"
        f"{enc_lines}\n"
        "readonly def\n"
        "currentdict end\n"
        "currentfile eexec\n"
    ).encode("ascii")

    priv = bytearray()
    priv += b"dup /Private 8 dict dup begin\n"
    priv += b"/lenIV 4 def\n"
    priv += b"/password 5839 def\n"
    if subrs:
        priv += f"/Subrs {len(subrs)} array\n".encode()
        for i, sub in enumerate(subrs):
            enc = charstring_encrypt(sub)
            priv += f"dup {i} {len(enc)} RD ".encode() + enc + b" NP\n"
        priv += b"ND\n"
    priv += f"/CharStrings {len(charstrings)} dict dup begin\n".encode()
    for name, cs in charstrings.items():
        enc = charstring_encrypt(cs)
        priv += f"/{name} {len(enc)} RD ".encode() + enc + b" ND\n"
    priv += b"end\nend\nreadonly put\nnoaccess put\n"
    priv += b"dup /FontName get exch definefont pop\n"
    priv += b"mark currentfile closefile\n"

    enc_portion = eexec_encrypt(bytes(priv))
    if hex_eexec:
        hexed = enc_portion.hex().encode("ascii")
        enc_portion = b"\n".join(
            hexed[i : i + 64] for i in range(0, len(hexed), 64)
        )
    trailer = (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"
    return clear + enc_portion + trailer, len(clear), len(enc_portion)


def build_pdf_with_fontfile(
    font_bytes: bytes,
    length1: int,
    length2: int,
    text_lines: Sequence[Tuple[int, int, int, bytes]],
    widths: Dict[int, int],
    differences: Dict[int, str] | None = None,
    truetype: bool = False,
) -> bytes:
    """One-page PDF embedding `font_bytes` as /FontFile (plain Type1) or,
    with truetype=True, as /FontFile2 (same layout, for pixel comparison
    against the engine's independent TrueType rasterizer).

    text_lines: (font_size, x, y, bytes-to-show) tuples.
    widths: code -> width/1000 for FirstChar..LastChar.
    """
    first, last = min(widths), max(widths)
    warr = " ".join(str(widths.get(c, 500)) for c in range(first, last + 1))
    enc_entry = ""
    if differences:
        diffs = " ".join(
            f"{code} /{name}" for code, name in sorted(differences.items())
        )
        enc_entry = f"/Encoding<</Type/Encoding/Differences[{diffs}]>>"
    content = b"".join(
        b"BT /F1 %d Tf %d %d Td (%s) Tj ET\n"
        % (size, x, y, txt.replace(b"(", rb"\(").replace(b")", rb"\)"))
        for size, x, y, txt in text_lines
    )
    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</Font<</F1 4 0 R>>>>/Contents 7 0 R>>",
        (
            f"<</Type/Font/Subtype/{'TrueType' if truetype else 'Type1'}"
            "/BaseFont/VcpType1Fixture"
            f"/FirstChar {first}/LastChar {last}/Widths[{warr}]"
            f"{enc_entry}/FontDescriptor 5 0 R>>"
        ).encode(),
        (
            "<</Type/FontDescriptor/FontName/VcpType1Fixture/Flags 32"
            "/FontBBox[-100 -300 1200 1000]/ItalicAngle 0/Ascent 928"
            "/Descent -236/CapHeight 729/StemV 90"
            f"/{'FontFile2' if truetype else 'FontFile'} 6 0 R>>"
        ).encode(),
        (
            f"<</Length {len(font_bytes)}"
            + ("" if truetype else f"/Length1 {length1}/Length2 {length2}"
               "/Length3 0")
            + ">>"
        ).encode()
        + b"\nstream\n" + font_bytes + b"\nendstream",
        (f"<</Length {len(content)}>>").encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
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
    return bytes(out)

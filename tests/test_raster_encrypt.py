"""Standard-security-handler round trips (VERDICT r3 missing item 2).

Fixtures are produced by an INDEPENDENT spec implementation
(tests/pdf_encrypt_util.py: hashlib + the `cryptography` library); the
C++ engine decrypts with its own hand-rolled MD5/SHA-2/RC4/AES
(raster/cpp/crypt.h).  An encrypted document must parse, extract, and
render byte-identically to its plaintext twin — the capability Poppler
gave the reference for free (reference
backend/app/pipeline/pdf_extract.py:107-122).
"""

from pathlib import Path

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument, make_pdf

from pdf_encrypt_util import encrypt_pdf

METHODS = ["rc4-40", "rc4-128", "aes-128", "aes-256"]

PAGES = [
    "Encrypted Document\nThe first page holds the headline figures.",
    "Second page: throughput rose 41 percent in March.",
    "Third page closes with a short summary line.",
]

DEJAVU = Path("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")


def _twins(tmp_path, method, **make_kwargs):
    plain = make_pdf(PAGES, tmp_path / "plain.pdf", **make_kwargs)
    enc = encrypt_pdf(plain, tmp_path / f"enc_{method}.pdf", method=method)
    return plain, enc


@pytest.mark.parametrize("method", METHODS)
def test_encrypted_matches_plaintext_twin(tmp_path, method):
    plain, enc = _twins(tmp_path, method)
    with PdfDocument(plain) as dp, PdfDocument(enc) as de:
        assert de.page_count == dp.page_count == len(PAGES)
        for i in range(len(PAGES)):
            assert de.extract_text(i) == dp.extract_text(i)
            assert PAGES[i].splitlines()[0] in de.extract_text(i)
        rp = dp.render_batch(0, len(PAGES) - 1, dpi=72)
        re_ = de.render_batch(0, len(PAGES) - 1, dpi=72)
        for a, b in zip(rp, re_):
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("method", ["rc4-128", "aes-128", "aes-256"])
def test_encrypted_flate_streams(tmp_path, method):
    """Encryption wraps OUTSIDE the filters: decrypt then FlateDecode."""
    plain, enc = _twins(tmp_path, method, compress=True)
    with PdfDocument(plain) as dp, PdfDocument(enc) as de:
        for i in range(len(PAGES)):
            assert de.extract_text(i) == dp.extract_text(i)
        np.testing.assert_array_equal(
            dp.render_page(1, dpi=72), de.render_page(1, dpi=72)
        )


@pytest.mark.skipif(not DEJAVU.exists(), reason="no DejaVu fonts on host")
def test_encrypted_embedded_font_streams(tmp_path):
    """FontFile2 streams (binary TTF) survive AES decrypt + inflate."""
    plain = make_pdf(
        PAGES, tmp_path / "plain.pdf", fonts=[str(DEJAVU)],
        page_fonts=[0] * len(PAGES),
    )
    enc = encrypt_pdf(plain, tmp_path / "enc.pdf", method="aes-128")
    with PdfDocument(plain) as dp, PdfDocument(enc) as de:
        for i in range(len(PAGES)):
            assert de.extract_text(i) == dp.extract_text(i)
        np.testing.assert_array_equal(
            dp.render_page(0, dpi=72), de.render_page(0, dpi=72)
        )
        # Embedded-outline rendering really happened: the page is not blank.
        assert (de.render_page(0, dpi=72) < 128).any()


def test_unencrypted_pdfs_unaffected(tmp_path):
    plain = make_pdf(PAGES, tmp_path / "p.pdf")
    with PdfDocument(plain) as d:
        assert d.page_count == len(PAGES)
        assert "Encrypted Document" in d.extract_text(0)

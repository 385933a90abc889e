import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument, make_pdf


@pytest.fixture(scope="module")
def sample_pdf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pdfs")
    pages = [
        "Hello World\nThis is page one.\nIt has three lines.",
        "Page two content here.\nAlpha Beta Gamma.",
        "The final page mentions zebras and xylophones.",
    ]
    path = make_pdf(pages, tmp / "sample.pdf")
    return path, pages


@pytest.fixture(scope="module")
def compressed_pdf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pdfs_z")
    pages = ["Compressed stream page.\nFlateDecode works."]
    return make_pdf(pages, tmp / "z.pdf", compress=True), pages


def test_page_count_from_page_tree(sample_pdf):
    path, pages = sample_pdf
    with PdfDocument(path) as doc:
        assert doc.page_count == 3
        w, h = doc.page_size_pts(0)
        assert (w, h) == (612.0, 792.0)


def test_text_extraction(sample_pdf):
    path, pages = sample_pdf
    with PdfDocument(path) as doc:
        text = doc.extract_text(0)
        assert "Hello World" in text
        assert "three lines" in text
        assert "Alpha Beta" in doc.extract_text(1)
        assert doc.has_text_layer()


def test_text_extraction_flate(compressed_pdf):
    path, pages = compressed_pdf
    with PdfDocument(path) as doc:
        assert "FlateDecode works" in doc.extract_text(0)


def test_render_page_has_ink(sample_pdf):
    path, _ = sample_pdf
    with PdfDocument(path) as doc:
        img = doc.render_page(0, dpi=72)
        assert img.shape == (792, 612, 3)
        assert img.dtype == np.uint8
        # Mostly white page with some black text ink.
        assert img.mean() > 200
        dark = (img < 128).mean()
        assert 0.0005 < dark < 0.2
        # Ink concentrated near the top-left (margin 72pt, first lines).
        top = img[60:200, 60:500]
        assert (top < 128).mean() > dark


def test_render_batch_matches_single(sample_pdf):
    path, _ = sample_pdf
    with PdfDocument(path) as doc:
        batch = doc.render_batch(0, 2, dpi=72, n_threads=4)
        assert len(batch) == 3
        for i, img in enumerate(batch):
            single = doc.render_page(i, dpi=72)
            np.testing.assert_array_equal(img, single)


def test_invalid_pdf_rejected(tmp_path):
    bad = tmp_path / "bad.pdf"
    bad.write_bytes(b"this is not a pdf at all")
    with pytest.raises(Exception):
        PdfDocument(bad)

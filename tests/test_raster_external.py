"""Real-world PDF rendering: externally-generated fixtures (VERDICT r1
items 2/6: round-1 raster tests only consumed the repo's own pdfgen.py
output, so parser bugs shared with the generator were invisible, and pages
with embedded images/fonts rendered blank).

Fixtures come from two INDEPENDENT PDF writers:
- PIL's PDF plugin: image-only pages whose pixels are a baseline-DCT
  (JPEG) image XObject — the scanned-document case.
- matplotlib's pdf backend (fonttype 42): embedded-TrueType subset fonts
  (Type0/CIDFontType2 + FontFile2 + CIDToGIDMap stream) plus a
  Flate/Indexed/PNG-predictor image XObject.
"""

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument

mpl = pytest.importorskip("matplotlib")


@pytest.fixture(scope="module")
def pil_jpeg_pdf(tmp_path_factory):
    """Image-only PDF (DCTDecode): red field with a centered blue block."""
    from PIL import Image

    img = np.zeros((200, 300, 3), np.uint8)
    img[:, :, 0] = 255
    img[50:150, 100:200] = [0, 0, 255]
    path = tmp_path_factory.mktemp("ext") / "pil_image.pdf"
    Image.fromarray(img).save(path, "PDF", resolution=72)
    return path


@pytest.fixture(scope="module")
def mpl_ttf_pdf(tmp_path_factory):
    """Text (embedded TrueType) + image (Flate/Indexed) page."""
    mpl.use("Agg")
    mpl.rcParams["pdf.fonttype"] = 42
    import matplotlib.pyplot as plt

    img = np.zeros((200, 300, 3), np.uint8)
    img[:, :, 0] = 255
    img[50:150, 100:200] = [0, 0, 255]
    fig = plt.figure(figsize=(6, 4))
    fig.text(0.05, 0.75, "Hello Embedded TrueType", fontsize=18)
    fig.text(0.05, 0.5, "External fixture 12345", fontsize=14)
    ax = fig.add_axes([0.55, 0.05, 0.4, 0.3])
    ax.imshow(img)
    ax.axis("off")
    path = tmp_path_factory.mktemp("ext") / "mpl_ttf.pdf"
    fig.savefig(path)
    plt.close(fig)
    return path


def test_jpeg_image_pdf_renders(pil_jpeg_pdf):
    with PdfDocument(pil_jpeg_pdf) as doc:
        assert doc.page_count == 1
        assert doc.page_complexity(0) & 1  # image XObject detected
        img = doc.render_page(0, dpi=72)
    assert img.shape == (200, 300, 3)
    # Red field everywhere outside the block (JPEG-lossy tolerance).
    corner = img[:30, :30].astype(int)
    assert corner[..., 0].mean() > 200 and corner[..., 2].mean() < 60
    # Blue block where it was drawn.
    center = img[80:120, 130:170].astype(int)
    assert center[..., 2].mean() > 200 and center[..., 0].mean() < 60


def test_mpl_ttf_pdf_renders_glyphs_and_image(mpl_ttf_pdf):
    with PdfDocument(mpl_ttf_pdf) as doc:
        assert doc.page_count == 1
        assert doc.page_complexity(0) == 3  # image + embedded font
        img = doc.render_page(0, dpi=100)
        text = doc.extract_text(0)
    assert "Hello Embedded" in text.replace("\n", " ")
    assert "12345" in text
    h, w, _ = img.shape
    # Glyph band: dark pixels where the 18pt line was drawn (top quarter).
    band = img[int(h * 0.18) : int(h * 0.30), : int(w * 0.6)]
    dark = (band < 100).all(axis=-1).mean()
    assert dark > 0.01, f"no glyph ink in the text band ({dark:.4f})"
    # The embedded image region carries the red field.
    region = img[int(h * 0.70) : int(h * 0.92), int(w * 0.60) : int(w * 0.90)]
    assert (region[..., 0].astype(int) - region[..., 2]).mean() > 100
    # The page is mostly white elsewhere.
    assert (img > 250).all(axis=-1).mean() > 0.7


def test_external_pdf_resists_glyph_transport(mpl_ttf_pdf):
    """The extract pipeline must ship pixels (not glyph primitives) for
    pages the device renderer cannot reproduce."""
    from vision_compression_project_tpu.pipeline.extract import _render_chunk

    with PdfDocument(mpl_ttf_pdf) as doc:
        out = _render_chunk(
            doc, [1], dpi=72, engine="vlm", images_dir=None,
            save_images=False, model_image_size=64,
        )
    # Pixel transport: {page: raster}, NOT {"glyphs": ...}.
    assert isinstance(out, dict) and 1 in out
    assert out[1].ndim == 3


def test_image_pdf_ingests_end_to_end(pil_jpeg_pdf, tmp_path):
    """VERDICT r1 item 2 'Done =': an image-bearing PDF renders visibly and
    flows through ingest end-to-end (extract -> page JSONs -> index)."""
    from vision_compression_project_tpu.index import IndexStore
    from vision_compression_project_tpu.models import (
        EmbedderConfig,
        HashNGramEmbedder,
        VLMRunner,
        get_preset,
    )
    from vision_compression_project_tpu.pipeline import extract, ingest

    runner = VLMRunner(get_preset("tiny"), max_new_default=8)
    stats = extract.extract_pdf_to_page_jsons(
        pil_jpeg_pdf, tmp_path / "pages", images_dir=tmp_path / "images",
        dpi=72, engine="vlm", batch_size=4, runner=runner,
    )
    assert stats["pages_total"] == 1
    assert stats["processed_pages"] == [1]
    assert stats["failed_pages"] == []
    png = tmp_path / "images" / "page_001.png"
    assert png.exists()
    from PIL import Image

    arr = np.asarray(Image.open(png))
    assert (arr < 250).any(axis=-1).mean() > 0.5, "image page rendered blank"

    embedder = HashNGramEmbedder(EmbedderConfig(dim=64, ngram_buckets=512))
    store = IndexStore(tmp_path / "idx", dim=64, mode="single")
    manifest = ingest.ingest_pages_dir(
        tmp_path / "pages", pdf_path=pil_jpeg_pdf, doc_id="imgdoc",
        manifest_path=tmp_path / "m.json", embedder=embedder, store=store,
    )
    assert len(manifest["pages"]) == 1 and manifest["failed_pages"] == []

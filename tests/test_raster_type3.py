"""Type3 fonts: glyph procedures as content streams — matplotlib's DEFAULT
pdf.fonttype (3) embeds text this way, so real-world figure PDFs depend on
it for both text extraction and rendering."""

import numpy as np
import pytest

from vision_compression_project_tpu.raster import PdfDocument

mpl = pytest.importorskip("matplotlib")


@pytest.fixture(scope="module")
def type3_pdf(tmp_path_factory):
    mpl.use("Agg")
    mpl.rcParams["pdf.fonttype"] = 3
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(5, 3))
    fig.text(0.08, 0.6, "Type Three Text 0123", fontsize=22, color="black")
    path = tmp_path_factory.mktemp("t3") / "type3.pdf"
    fig.savefig(path)
    plt.close(fig)
    raw = path.read_bytes()
    assert b"/Type3" in raw  # matplotlib actually embedded Type3
    return path


def test_type3_text_extraction(type3_pdf):
    with PdfDocument(type3_pdf) as doc:
        text = doc.extract_text(0).replace("\n", " ")
    assert "Type Three Text 0123" in text, text


def test_type3_glyphs_render(type3_pdf):
    with PdfDocument(type3_pdf) as doc:
        assert doc.page_complexity(0) != 0  # embedded-outline class
        page = doc.render_page(0, dpi=100)
    gray = page.mean(axis=2)
    h, w = gray.shape
    band = gray[int(h * 0.30) : int(h * 0.55), : int(w * 0.8)]
    dark = (band < 100).mean()
    assert dark > 0.01, f"no Type3 glyph ink ({dark:.4f})"
    # Ink must be structured (glyphs), not a solid blob.
    assert dark < 0.5, dark


def test_type3_pdf_ingests_end_to_end(tmp_path):
    """A real matplotlib (fonttype 3) document flows through the FULL
    pipeline: text extraction -> ingest -> retrieval -> cited answer."""
    mpl.use("Agg")
    mpl.rcParams["pdf.fonttype"] = 3
    import matplotlib.pyplot as plt

    from vision_compression_project_tpu.index import IndexStore
    from vision_compression_project_tpu.models import (
        EmbedderConfig,
        HashNGramEmbedder,
    )
    from vision_compression_project_tpu.pipeline import extract, ingest, qa

    fig = plt.figure(figsize=(5, 3))
    fig.text(0.05, 0.7, "Quarterly revenue grew twelve percent", fontsize=14)
    fig.text(0.05, 0.4, "Hardware costs fell by three points", fontsize=14)
    pdf = tmp_path / "report.pdf"
    fig.savefig(pdf)
    plt.close(fig)

    extract.extract_pdf_to_page_jsons(
        pdf, tmp_path / "pages", dpi=72, engine="text"
    )
    embedder = HashNGramEmbedder(EmbedderConfig(dim=128, ngram_buckets=2048))
    store = IndexStore(tmp_path / "idx", dim=128)
    ingest.ingest_pages_dir(
        tmp_path / "pages", pdf, "t3doc", tmp_path / "manifest.json",
        embedder=embedder, store=store,
    )
    result = qa.answer_question(
        "t3doc", "How much did quarterly revenue grow?",
        store=store, embedder=embedder, engine="extractive",
        manifest_path=tmp_path / "manifest.json",
    )
    assert "twelve percent" in result["answer_md"]
    assert "(t3doc p.1)" in result["answer_md"]

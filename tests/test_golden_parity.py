"""Golden-fixture parity tests against the reference's checked-in artifacts.

The reference repo ships a complete 22-page extraction/ingest/QA run of the
DeepSeek-OCR paper under /root/reference/output/ (SURVEY.md §4: 18 pages in
the legacy {page_number, raw_response} shape, 4 in the normalized
{page_number, markdown, entities, summary} shape, plus manifest.json,
supermemory_manifest.json, combined.md and an answers/*_answer.md file).
These are the de-facto golden files for schema/format parity; every test
here reads them READ-ONLY and skips cleanly when the fixture tree is absent.
"""

import json
import re
from pathlib import Path

import pytest

from vision_compression_project_tpu.pipeline import extract
from vision_compression_project_tpu.pipeline.ingest import (
    _page_content,
    parse_json_file,
)

GOLDEN = Path("/root/reference/output")

pytestmark = pytest.mark.skipif(
    not GOLDEN.is_dir(), reason="reference golden fixtures not available"
)


def _page_jsons():
    return sorted((GOLDEN / "pages").glob("page_*.json"))


def test_fixture_inventory():
    """The fixture set this suite certifies against: 22 pages, both shapes."""
    files = _page_jsons()
    assert len(files) == 22
    shapes = {"raw": 0, "normalized": 0}
    for f in files:
        data = json.loads(f.read_text(encoding="utf-8"))
        if "raw_response" in data:
            shapes["raw"] += 1
        else:
            assert set(data) == {"page_number", "markdown", "entities", "summary"}
            shapes["normalized"] += 1
    assert shapes == {"raw": 18, "normalized": 4}


def test_parse_every_golden_page_json():
    """parse_json_file must handle BOTH legacy shapes: fenced-JSON
    raw_response unwrap and the already-normalized shape
    (reference supermemory_ingest.py:20-50)."""
    for f in _page_jsons():
        page_no = int(re.search(r"page_(\d+)\.json$", f.name).group(1))
        data = parse_json_file(f)
        assert data.get("page_number") == page_no, f.name
        content = _page_content(data)
        assert content and isinstance(content, str), f.name
        # Unwrapped content must be real page text, not a fenced blob.
        assert not content.lstrip().startswith("```"), f.name
        assert isinstance(data.get("entities", []), list), f.name


def test_page1_unwrap_content():
    """Spot-check the unwrap yields the actual markdown of the golden run.

    page_001's raw_response is fenced JSON truncated mid-markdown (the model
    hit its token budget); the repair pass must still recover the real text.
    The entities/summary fields were cut off before they were emitted, so
    only markdown is guaranteed here."""
    data = parse_json_file(GOLDEN / "pages" / "page_001.json")
    assert data["markdown"].startswith("# DeepSeek-OCR")
    assert "DeepEncoder" in data["markdown"]


def test_normalized_page_fields():
    """A normalized-shape fixture carries all four fields verbatim."""
    data = parse_json_file(GOLDEN / "pages" / "page_009.json")
    assert set(data) == {"page_number", "markdown", "entities", "summary"}
    assert data["entities"] and data["summary"]


def test_combined_markdown_byte_parity(tmp_path):
    """Regenerating combined.md from the golden page JSONs must reproduce
    the reference's checked-in combined.md byte-for-byte
    (reference scripts/extract_pdf_with_gemini.py:226-254)."""
    out = extract.create_combined_markdown(
        GOLDEN / "pages", tmp_path / "combined.md"
    )
    ours = out.read_bytes()
    theirs = (GOLDEN / "combined.md").read_bytes()
    assert ours == theirs


def test_manifest_schema_parity():
    """create_manifest emits exactly the golden manifest.json key set."""
    golden = json.loads((GOLDEN / "manifest.json").read_text(encoding="utf-8"))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ours = extract.create_manifest(
            "dummy.pdf",
            Path(td) / "manifest.json",
            {"pages_total": 22, "processed_pages": list(range(1, 23)),
             "failed_pages": []},
            dpi=200, start_page=1, end_page=22, model_name="vcp-tpu",
        )
    assert set(ours) == set(golden)
    assert golden["total_pages"] == 22 and golden["failed_pages"] == []


def test_supermemory_manifest_schema_parity():
    """Golden script-variant manifest: {doc_id, pdf_path, created_at,
    pages:[{page, file, memory_id}]}.  Our script CLI writes the same keys
    (scripts/ingest_to_index.py); the backend variant adds failed_pages
    (pipeline/ingest.py) exactly as the reference backend does."""
    golden = json.loads(
        (GOLDEN / "supermemory_manifest.json").read_text(encoding="utf-8")
    )
    assert set(golden) == {"doc_id", "pdf_path", "created_at", "pages"}
    for entry in golden["pages"]:
        assert set(entry) == {"page", "file", "memory_id"}
    # Windows-path file entries in old manifests must still be readable.
    assert any("\\" in e["file"] for e in golden["pages"])


def test_ingest_golden_pages_end_to_end(tmp_path):
    """The golden pages dir flows through OUR ingest pipeline: all 22 pages
    embedded and indexed, manifest schema matching the reference backend's
    (supermemory_ingest.py:233-247), content from the unwrap chain."""
    from vision_compression_project_tpu.index import IndexStore
    from vision_compression_project_tpu.models import get_embedder
    from vision_compression_project_tpu.models.configs import EmbedderConfig
    from vision_compression_project_tpu.pipeline.ingest import ingest_pages_dir

    embedder = get_embedder("hash", EmbedderConfig(dim=128))
    store = IndexStore(tmp_path / "index", dim=128, mode="single")
    manifest = ingest_pages_dir(
        GOLDEN / "pages",
        pdf_path="deepseek_ocr_paper.pdf",
        doc_id="deepseek_ocr_paper",
        manifest_path=tmp_path / "supermemory_manifest.json",
        embedder=embedder,
        store=store,
    )
    assert set(manifest) == {"doc_id", "pdf_path", "pages", "failed_pages"}
    assert len(manifest["pages"]) == 22
    assert manifest["failed_pages"] == []
    assert [e["page"] for e in manifest["pages"]] == list(range(1, 23))

    # Retrieval over the golden content must surface compression pages.
    results = store.search(
        embedder.embed(["optical context compression ratio"]),
        top_k=5,
        doc_id="deepseek_ocr_paper",
    )[0]
    assert results, "no hits over golden content"
    assert all(r["metadata"]["doc_id"] == "deepseek_ocr_paper" for r in results)


def test_answers_file_format_parity(tmp_path):
    """save_answer writes the reference's exact answer-file layout
    (qa_with_supermemory_and_gemini.py:324-366), validated structurally
    against the golden answers file."""
    golden_file = next((GOLDEN / "answers").glob("*_answer.md"))
    golden_text = golden_file.read_text(encoding="utf-8")
    for section in ("# Question\n\n", "# Answer\n\n",
                    "# Retrieved Pages (for debugging)\n\n"):
        assert section in golden_text

    import importlib.util
    import sys

    scripts_dir = Path(__file__).parent.parent / "scripts"
    sys.path.insert(0, str(scripts_dir))  # for the CLI's _bootstrap import
    try:
        spec = importlib.util.spec_from_file_location(
            "qa_query_cli", scripts_dir / "qa_query.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["qa_query_cli"] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(scripts_dir))

    result = {
        "answer_md": "The answer (doc p.1).",
        "retrieved": [
            {"page": 3, "memory_id": "abc123", "excerpt": "x"},
            {"page": 19, "memory_id": "", "excerpt": "y"},
        ],
    }
    path = mod.save_answer("What is the main contribution?", result, tmp_path)
    text = path.read_text(encoding="utf-8")
    assert re.match(r"\d{8}_\d{6}_answer\.md$", path.name)
    assert text.startswith("# Question\n\nWhat is the main contribution?\n\n")
    assert "# Answer\n\nThe answer (doc p.1).\n\n---\n\n" in text
    assert "# Retrieved Pages (for debugging)\n\n" in text
    # The golden file's line format, including the empty-memory_id case.
    assert "- Page 3: memory_id=abc123\n" in text
    assert "- Page 19: memory_id=\n" in text

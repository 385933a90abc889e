import numpy as np
import pytest

from vision_compression_project_tpu.index import IndexStore
from vision_compression_project_tpu.index.multivector import MultiVectorIndex
from vision_compression_project_tpu.models import EmbedderConfig, HashNGramEmbedder
from vision_compression_project_tpu.pipeline import extract, ingest, qa
from vision_compression_project_tpu.raster import make_pdf


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_maxsim_prefers_fine_grained_match():
    rng = np.random.default_rng(0)
    dim = 64
    # Page A: one vector strongly matching q1; another matching q2.
    q1, q2, noise = _unit(rng.standard_normal((3, dim)))
    page_a = np.stack([q1, q2])
    # Page B: single pooled-ish vector = average (weaker per-query match).
    page_b = _unit((q1 + q2) / 2)[None]
    index = MultiVectorIndex(dim=dim, vecs_per_page=4, capacity=4)
    ids = index.add(
        [page_a, page_b, noise[None]],
        [
            {"doc_id": "d", "page": 1, "content": "a"},
            {"doc_id": "d", "page": 2, "content": "b"},
            {"doc_id": "d", "page": 3, "content": "c"},
        ],
    )
    results = index.search(np.stack([q1, q2]), top_k=3, doc_id="d")
    assert results[0]["id"] == ids[0]  # exact per-vector matches win
    assert results[0]["score"] > results[1]["score"]


def test_multivector_padding_and_filter():
    rng = np.random.default_rng(1)
    dim = 32
    index = MultiVectorIndex(dim=dim, vecs_per_page=3, capacity=2)  # grows
    sets = [_unit(rng.standard_normal((k, dim))) for k in (1, 5, 3, 2)]
    index.add(
        sets,
        [{"doc_id": "x" if i < 2 else "y", "page": i + 1, "content": str(i)}
         for i in range(4)],
    )
    assert index.count == 4
    q = _unit(rng.standard_normal((2, dim)))
    res_x = index.search(q, top_k=10, doc_id="x")
    assert {r["metadata"]["page"] for r in res_x} == {1, 2}
    assert index.search(q, top_k=10, doc_id="zzz") == []


def test_multivector_save_load(tmp_path):
    rng = np.random.default_rng(2)
    index = MultiVectorIndex(dim=16, vecs_per_page=2)
    sets = [_unit(rng.standard_normal((2, 16))) for _ in range(3)]
    ids = index.add(
        sets, [{"doc_id": "d", "page": i + 1, "content": f"p{i}"} for i in range(3)]
    )
    index.save(tmp_path / "mv")
    loaded = MultiVectorIndex.load(tmp_path / "mv")
    assert loaded.count == 3
    res = loaded.search(sets[1], top_k=1, doc_id="d")
    assert res[0]["id"] == ids[1]


def test_multi_mode_end_to_end(tmp_path):
    """Full extract -> multi-vector ingest -> MaxSim QA."""
    pages = [
        "Engines\nDiesel engines compress air before fuel injection.\n"
        "Turbochargers increase intake pressure substantially.",
        "Brakes\nDisc brakes convert motion into heat through friction.\n"
        "Antilock systems prevent wheel lockup during stops.",
    ]
    pdf = make_pdf(pages, tmp_path / "doc.pdf")
    extract.extract_pdf_to_page_jsons(pdf, tmp_path / "pages", dpi=72, engine="text")
    embedder = HashNGramEmbedder(EmbedderConfig(dim=256, ngram_buckets=4096))
    store = IndexStore(tmp_path / "idx", dim=256, mode="multi")
    manifest = ingest.ingest_pages_dir(
        tmp_path / "pages", pdf, "cars", tmp_path / "sm.json",
        embedder=embedder, store=store,
    )
    assert len(manifest["pages"]) == 2
    result = qa.answer_question(
        "cars", "How do disc brakes work?", top_k=2,
        store=store, embedder=embedder,
    )
    assert result["retrieved"]
    assert result["retrieved"][0]["page"] == 2
    assert "friction" in result["answer_md"].lower()
    assert "(cars p.2" in result["answer_md"]
    # Reload from disk and query again (persistence in multi mode).
    store2 = IndexStore(tmp_path / "idx", dim=256, mode="multi")
    result2 = qa.answer_question(
        "cars", "What increases intake pressure?", top_k=2,
        store=store2, embedder=embedder,
    )
    assert result2["retrieved"][0]["page"] == 1

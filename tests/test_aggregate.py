"""Analytic aggregation answer engine (pipeline/aggregate.py): the
deterministic count/sum/superlative path the 'auto' engine tries before
generation — the reference answered these with its Gemini pass
(reference backend/app/pipeline/qa.py:189-217); a quote-ranking engine
cannot state claims that appear in no evidence sentence."""

import re

import numpy as np
import pytest

from vision_compression_project_tpu.pipeline.aggregate import (
    classify_question,
    try_analytic_answer,
)
from vision_compression_project_tpu.train.data import (
    _synthetic_agg_qa_example,
)


def _pack_results(evidence_pack):
    results = []
    for section in evidence_pack.split("\n\n---\n\n"):
        header, _, content = section.partition("\n")
        m = re.match(r"\[Page (\d+) \| memory_id=(\S+)\]", header)
        if m:
            results.append({
                "id": m.group(2), "content": content,
                "metadata": {"page": int(m.group(1))},
            })
    return results


def _keyfact_ok(got, facts):
    if not re.search(rf"\b{facts['value']}\b", got):
        return False
    if facts["kind"] == "max":
        low = got.lower()
        if facts["name"] not in low or "most" not in low:
            return False
    return True


def test_classify_question_shapes():
    assert classify_question("How many pages mention the cache module?") == (
        "count", {"phrase": "cache module"}
    )
    kind, slots = classify_question(
        "How many units were produced in total across all plants?"
    )
    assert kind == "sum" and slots == {"item": "units", "subject": "plant"}
    kind, slots = classify_question("Which team produced the most reports?")
    assert kind == "max" and slots["subject"] == "team"
    assert slots["item"] == "reports"
    kind, _ = classify_question("Which sensor recorded the fewest errors?")
    assert kind == "min"
    # Non-aggregation questions must NOT parse (auto falls through to lm).
    assert classify_question("What is the document about?") is None
    assert classify_question("Summarize the methodology section.") is None


def test_analytic_engine_on_synthetic_distribution():
    """Across fresh examples of every kind the analytic engine must be
    near-perfect — this is the capability the LM gate measured at 0.25."""
    rng = np.random.default_rng(99)
    total = answered = correct = 0
    cited_cov = 0.0
    for _ in range(60):
        q, ev, _teacher, facts = _synthetic_agg_qa_example(rng)
        got = try_analytic_answer(q, _pack_results(ev), None, "doc", 1500)
        total += 1
        if got is None:
            continue
        answered += 1
        correct += _keyfact_ok(got, facts)
        need = facts["cited"]
        cited_cov += sum(f"p.{p}" in got for p in need) / len(need)
    assert answered / total > 0.9, f"only {answered}/{total} parsed"
    assert correct / answered > 0.95, f"{correct}/{answered} correct"
    assert cited_cov / answered > 0.9, "citations incomplete"


def test_analytic_engine_real_language_pool():
    """Same but with evidence drawn from the real corpus (what /chat sees
    at serve time)."""
    from vision_compression_project_tpu.train.corpus import corpus_sentences

    pool = corpus_sentences("train")
    rng = np.random.default_rng(7)
    correct = answered = 0
    for _ in range(30):
        q, ev, _t, facts = _synthetic_agg_qa_example(rng, sentence_pool=pool)
        got = try_analytic_answer(q, _pack_results(ev), None, "doc", 1500)
        if got is not None:
            answered += 1
            correct += _keyfact_ok(got, facts)
    assert answered >= 25
    assert correct / answered > 0.9


def test_no_confident_answer_returns_none():
    # Aggregation-shaped question but evidence without numeric facts:
    # the engine must decline, not guess.
    results = [{
        "id": "m1", "metadata": {"page": 1},
        "content": "The methodology is described at a high level only.",
    }]
    got = try_analytic_answer(
        "How many units were produced in total across all plants?",
        results, None, "doc", 1500,
    )
    assert got is None
    # Superlative with a tie: no single answer -> decline.
    tied = [
        {"id": "m1", "metadata": {"page": 1},
         "content": "Team alpha produced 40 reports."},
        {"id": "m2", "metadata": {"page": 2},
         "content": "Team beta produced 40 reports."},
    ]
    got = try_analytic_answer(
        "Which team produced the most reports?", tied, None, "doc", 1500
    )
    assert got is None


def test_auto_engine_routes_aggregation_to_analytic(tmp_path):
    """End-to-end answer_question: an aggregation question over an
    ingested doc is answered deterministically (no LM runner needed)."""
    from vision_compression_project_tpu.index import IndexStore
    from vision_compression_project_tpu.models import (
        EmbedderConfig,
        HashNGramEmbedder,
    )
    from vision_compression_project_tpu.pipeline import qa

    embedder = HashNGramEmbedder(EmbedderConfig(dim=256, ngram_buckets=4096))
    store = IndexStore(tmp_path / "idx", dim=embedder.dim)
    texts = [
        "Plant alpha produced 30 widgets. Budget notes follow.",
        "Plant beta produced 45 widgets. The cache module is covered here.",
        "Plant gamma produced 12 widgets.",
    ]
    vecs = np.asarray(embedder.embed(texts))
    store.add(
        vecs,
        [{"doc_id": "d1", "page": i + 1, "content": t}
         for i, t in enumerate(texts)],
    )
    result = qa.answer_question(
        "d1", "Which plant produced the most widgets?",
        store=store, embedder=embedder, engine="auto",
    )
    ans = result["answer_md"]
    assert "beta" in ans.lower() and "45" in ans and "p.2" in ans
    result = qa.answer_question(
        "d1", "How many widgets were produced in total across all plants?",
        store=store, embedder=embedder, engine="auto",
    )
    assert "87" in result["answer_md"]
    # Non-aggregation question still answers (extractive fallback, no
    # trained checkpoint in this environment).
    result = qa.answer_question(
        "d1", "What does the cache module section cover?",
        store=store, embedder=embedder, engine="extractive",
    )
    assert result["answer_md"]

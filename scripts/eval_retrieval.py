#!/usr/bin/env python3
"""Retrieval quality harness: hit@k over synthetic documents.

Builds N synthetic pages with known per-page facts, ingests them under each
retrieval configuration, and asks one templated question per page; a hit
means the gold page is retrieved in the top k.  Compares the single-vector
and multi-vector (MaxSim) modes and embedder backends side by side."""

import argparse
import tempfile
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np


def build_corpus(n_pages: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    topics = [
        "solar panels", "wind turbines", "battery storage", "hydro dams",
        "nuclear reactors", "geothermal wells", "tidal generators",
        "biomass plants", "grid transformers", "transmission lines",
        "carbon capture", "heat pumps", "electric vehicles", "fuel cells",
        "smart meters", "demand response", "insulation retrofits",
        "district heating", "power inverters", "charging stations",
    ]
    pages, questions = [], []
    for i in range(n_pages):
        topic = topics[i % len(topics)]
        qualifier = f"variant {i // len(topics)}" if i >= len(topics) else ""
        fact_value = int(rng.integers(10, 99))
        page = (
            f"Section on {topic} {qualifier}\n"
            f"This section covers {topic} in detail.\n"
            f"The measured efficiency of {topic} {qualifier} is {fact_value} percent.\n"
            f"Additional general commentary about energy systems follows here."
        )
        pages.append(page)
        questions.append((f"What is the efficiency of {topic} {qualifier}?", i + 1))
    return pages, questions


def evaluate(mode: str, backend: str, pages, questions, k: int) -> float:
    from vision_compression_project_tpu.index import IndexStore
    from vision_compression_project_tpu.models import EmbedderConfig, get_embedder
    from vision_compression_project_tpu.pipeline import extract, ingest, qa
    from vision_compression_project_tpu.raster import make_pdf

    tmp = Path(tempfile.mkdtemp(prefix=f"vcp_eval_{mode}_{backend}_"))
    pdf = make_pdf(pages, tmp / "corpus.pdf")
    extract.extract_pdf_to_page_jsons(pdf, tmp / "pages", dpi=72, engine="text")
    embedder = get_embedder(backend, EmbedderConfig())
    store = IndexStore(tmp / "idx", dim=embedder.dim, mode=mode)
    ingest.ingest_pages_dir(
        tmp / "pages", pdf, "corpus", tmp / "sm.json",
        embedder=embedder, store=store,
    )
    hits = 0
    for question, gold_page in questions:
        result = qa.answer_question(
            "corpus", question, top_k=k, store=store, embedder=embedder,
        )
        if any(r["page"] == gold_page for r in result["retrieved"]):
            hits += 1
    return hits / len(questions)


def main():
    parser = argparse.ArgumentParser(description="Retrieval hit@k evaluation.")
    parser.add_argument("--pages", type=int, default=40)
    parser.add_argument("--top_k", type=int, default=3)
    parser.add_argument(
        "--configs", nargs="+",
        default=["single:hash", "multi:hash"],
        help="mode:backend pairs to evaluate",
    )
    args = parser.parse_args()

    pages, questions = build_corpus(args.pages)
    print(f"corpus: {len(pages)} pages, hit@{args.top_k}")
    for config in args.configs:
        mode, backend = config.split(":")
        score = evaluate(mode, backend, pages, questions, args.top_k)
        print(f"  {config:>16}: {score:.3f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Retrieval + cited-answer QA CLI.

Same argparse surface and answer-file format as the reference's
scripts/qa_with_supermemory_and_gemini.py (--question --manifest --top_k
--max_chars_per_page --model --rewrite_query; writes
output/answers/<YYYYMMDD_HHMMSS>_answer.md with '# Question / # Answer /
# Retrieved Pages (for debugging)' sections, reference :324-366), with
retrieval and generation on device.  --rewrite_query replaces the
reference's extra Gemini round-trip (reference :189-232) with the
MODEL-BASED rewriter: candidate phrases scored by the serving embedding
model in the index's own vector space (pipeline/qa.py::
rewrite_query_learned), deterministic content-word fallback."""

import argparse
import json
from datetime import datetime
from pathlib import Path

import _bootstrap  # noqa: F401

from vision_compression_project_tpu.pipeline import qa


def save_answer(question: str, result: dict, answers_dir: Path) -> Path:
    """Answer file in the reference's exact format (reference
    qa_with_supermemory_and_gemini.py:324-366): Question / Answer sections,
    a '---' rule, then '# Retrieved Pages (for debugging)' with
    '- Page N: memory_id=M' lines."""
    answers_dir.mkdir(parents=True, exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    path = answers_dir / f"{timestamp}_answer.md"
    pages_list = "\n".join(
        f"- Page {r['page']}: memory_id={r['memory_id']}"
        for r in result["retrieved"]
    )
    content = (
        f"# Question\n\n{question}\n\n"
        f"# Answer\n\n{result['answer_md']}\n\n"
        f"---\n\n"
        f"# Retrieved Pages (for debugging)\n\n{pages_list}\n"
    )
    path.write_text(content, encoding="utf-8")
    return path


def main():
    parser = argparse.ArgumentParser(
        description="Question answering using on-TPU retrieval + generation with citations."
    )
    parser.add_argument("--question", required=True, help="Question to answer")
    parser.add_argument(
        "--manifest", default="output/supermemory_manifest.json",
        help="Path to ingest manifest (default: output/supermemory_manifest.json)",
    )
    parser.add_argument(
        "--top_k", type=int, default=8,
        help="Number of top results to retrieve (default: 8)",
    )
    parser.add_argument(
        "--max_chars_per_page", type=int, default=1500,
        help="Maximum characters per page in evidence pack (default: 1500)",
    )
    parser.add_argument(
        "--model", default=None,
        help="Answer engine override: extractive | lm (default: auto)",
    )
    parser.add_argument(
        "--rewrite_query", action="store_true",
        help="Rewrite the question into search phrases before retrieval",
    )
    args = parser.parse_args()

    manifest_path = Path(args.manifest)
    doc_id = None
    if manifest_path.exists():
        try:
            doc_id = json.loads(manifest_path.read_text(encoding="utf-8")).get("doc_id")
        except Exception:
            pass
    if not doc_id:
        print(f"Error: could not read doc_id from manifest {manifest_path}")
        raise SystemExit(1)

    question = args.question
    if args.rewrite_query:
        # Model-based rewrite (the reference's Gemini round trip): phrases
        # scored by the serving embedder in the index's own vector space.
        from vision_compression_project_tpu.pipeline.ingest import (
            _get_embedder,
        )

        phrases = qa.rewrite_query_learned(question, _get_embedder())
        print(f"Rewritten query phrases: {phrases}")
        search_question = "; ".join(phrases)
    else:
        search_question = question

    result = qa.answer_question(
        doc_id=doc_id,
        question=search_question,
        top_k=args.top_k,
        max_chars_per_page=args.max_chars_per_page,
        manifest_path=manifest_path,
        engine=args.model,
    )
    # Present the original question in output even when rewritten.
    print("\n=== Answer ===\n")
    print(result["answer_md"])
    print("\n=== Retrieved ===")
    for r in result["retrieved"]:
        print(f"- page {r['page']} ({r['memory_id'][:8]}…)")
    path = save_answer(question, result, Path("output/answers"))
    print(f"\nSaved: {path}")


if __name__ == "__main__":
    main()

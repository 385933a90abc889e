#!/usr/bin/env python3
"""Train the BPE merge table (models/bpe_merges.json).

Corpus: the framework's own synthetic page generators (the training/serving
input distribution), markdown-structured variants of them, digit-code OCR
pages, and — when the reference's golden 22-page run is available read-only
— its extracted markdown, so merges cover real document English too.

Run once; the merges file is committed.  Re-run when the corpus or target
vocab changes (model embeddings must be retrained to match).
"""

import argparse
import sys
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np

from vision_compression_project_tpu.models.tokenizer import (
    BPETokenizer,
    DEFAULT_MERGES_PATH,
)
from vision_compression_project_tpu.pipeline.textmd import structure_page
from vision_compression_project_tpu.train.data import (
    synthetic_code_page,
    synthetic_page_text,
)

GOLDEN_PAGES = Path("/root/reference/output/pages")


def build_corpus(n_pages: int = 3000, seed: int = 0) -> list:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n_pages):
        t = synthetic_page_text(rng, lines=int(rng.integers(6, 24)))
        texts.append(t)
        rec = structure_page(t, i + 1)
        texts.append(rec["markdown"])
        texts.append(rec["summary"])
        texts.extend(rec["entities"])
    for _ in range(n_pages // 10):
        texts.append(synthetic_code_page(rng))
    if GOLDEN_PAGES.is_dir():
        from vision_compression_project_tpu.pipeline.ingest import (
            parse_json_file,
        )

        for f in sorted(GOLDEN_PAGES.glob("page_*.json")):
            try:
                data = parse_json_file(f)
            except Exception:
                continue
            texts.append(data.get("markdown", ""))
            texts.append(data.get("summary", "") or "")
    # General English/markdown: locally installed package docs (METADATA /
    # *.md long-descriptions) and this repo's own documentation — needed
    # because the synthetic generator's 30-word vocabulary alone cannot
    # support ~4k distinct merges.
    import glob as _glob

    doc_files = []
    doc_files += _glob.glob(
        "/opt/venv/lib/python3.12/site-packages/*/METADATA"
    ) + _glob.glob("/opt/venv/lib/python3.12/site-packages/*.dist-info/METADATA")
    doc_files += [str(p) for p in Path(__file__).resolve().parent.parent.glob("*.md")]
    doc_files += [
        str(p)
        for p in (Path(__file__).resolve().parent.parent / "docs").glob("**/*.md")
    ]
    budget = 6_000_000
    used = 0
    for fp in sorted(doc_files):
        try:
            body = Path(fp).read_text(encoding="utf-8", errors="ignore")
        except Exception:
            continue
        texts.append(body[:200_000])
        used += min(len(body), 200_000)
        if used > budget:
            break
    return texts


def build_real_corpus(n_pages: int = 2000, seed: int = 0) -> list:
    """Real-language corpus (train split only — heldout sentences never
    influence the tokenizer) in the exact distribution the ocr_real model
    is trained and served on: wrapped prose pages + their textmd
    structurings + digit-code pages for the OCR digit path."""
    from vision_compression_project_tpu.train.corpus import (
        corpus_sentences,
        real_page_text,
    )

    rng = np.random.default_rng(seed)
    texts = list(corpus_sentences("train"))
    for i in range(n_pages):
        t = real_page_text(
            rng,
            lines=int(rng.integers(8, 32)),
            font_size=int(rng.choice([12, 14, 16, 20, 32])),
        )
        texts.append(t)
        rec = structure_page(t, i + 1)
        texts.append(rec["markdown"])
        texts.append(rec["summary"])
        texts.extend(rec["entities"])
    for _ in range(n_pages // 10):
        texts.append(synthetic_code_page(rng))
    return texts


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--vocab_size", type=int, default=4096)
    parser.add_argument("--pages", type=int, default=3000)
    parser.add_argument(
        "--corpus", choices=["mixed", "real"], default="mixed",
        help="real: open-vocabulary prose corpus for the ocr_real preset",
    )
    parser.add_argument("--out", default=str(DEFAULT_MERGES_PATH))
    args = parser.parse_args()

    if args.corpus == "real":
        texts = build_real_corpus(args.pages)
    else:
        texts = build_corpus(args.pages)
    total_bytes = sum(len(t.encode("utf-8")) for t in texts)
    print(f"corpus: {len(texts)} texts, {total_bytes / 1e6:.2f} MB")
    tok = BPETokenizer.train(texts, vocab_size=args.vocab_size)
    path = tok.save(args.out)
    print(f"trained {len(tok.merges)} merges -> vocab {tok.vocab_size}")
    print(f"saved: {path}")

    sample = texts[0]
    ids = tok.encode(sample)
    ratio = len(sample.encode("utf-8")) / max(1, len(ids))
    print(f"sample compression: {ratio:.2f} bytes/token")
    assert tok.decode(ids) == sample
    if GOLDEN_PAGES.is_dir():
        from vision_compression_project_tpu.pipeline.ingest import (
            parse_json_file,
        )

        md = parse_json_file(GOLDEN_PAGES / "page_009.json")["markdown"]
        r2 = len(md.encode("utf-8")) / max(1, len(tok.encode(md)))
        print(f"golden-page compression: {r2:.2f} bytes/token")
    return 0


if __name__ == "__main__":
    sys.exit(main())

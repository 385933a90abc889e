#!/usr/bin/env python3
"""Full-page extraction quality: does the VLM engine reproduce the text
engine's structured output on FRESH synthetic pages?

The text engine (pipeline/textmd.py) computes the ground-truth
{markdown, summary, entities} for a synthetic page deterministically; the
VLM engine must recover the same from pixels alone.  Reports
SequenceMatcher similarity per field — the VERDICT r1 target is >= 0.9
markdown similarity for the trained checkpoint."""

import argparse
import difflib
import json
import tempfile
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np


def _extract_chunked(runner, pages, args):
    """extract_batch in fixed-size padded chunks, one flushed progress
    line per chunk — the eval heartbeat for staleness watchdogs.  The
    last chunk ships padded to the compiled chunk shape and
    collect_extract trims to the real page_numbers."""
    import time

    n = pages.shape[0]
    chunk = max(1, min(getattr(args, "chunk", 4) or n, n))
    records = []
    t0 = time.time()
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        block = pages[lo:hi]
        if hi - lo < chunk:  # pad to the compiled shape
            pad = np.repeat(block[-1:], chunk - (hi - lo), axis=0)
            block = np.concatenate([block, pad], axis=0)
        records.extend(
            runner.extract_batch(
                block, page_numbers=list(range(lo + 1, hi + 1))
            )
        )
        print(
            f"eval pages {hi}/{n} ({time.time() - t0:.0f}s)", flush=True
        )
    return records


def _eval_golden_png(args):
    """Score the VLM on the reference's OWN page rasters: real document
    pixels (nothing synthetic anywhere in the loop), ground truth = the
    markdown its pipeline extracted (pages/page_NNN.json raw_response)."""
    import difflib
    import os

    from PIL import Image

    from vision_compression_project_tpu.models import get_preset
    from vision_compression_project_tpu.train.checkpoint import load_runner
    from vision_compression_project_tpu.utils.json_utils import safe_json_loads

    pages_dir = Path(
        os.environ.get("VCP_GOLDEN_PAGES", "/root/reference/output/pages")
    )
    pngs = sorted(pages_dir.glob("page_*.png"))[: args.pages]
    if not pngs:
        raise SystemExit(f"no golden page PNGs under {pages_dir}")
    golds, imgs = [], []
    for png in pngs:
        rec = safe_json_loads(
            json.loads(png.with_suffix(".json").read_text())["raw_response"]
        )
        if not isinstance(rec, dict) or "markdown" not in rec:
            continue
        golds.append(rec["markdown"])
        imgs.append(np.asarray(Image.open(png).convert("RGB")))
    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    batch = np.full((len(imgs), h, w, 3), 255, np.uint8)
    for i, im in enumerate(imgs):
        batch[i, : im.shape[0], : im.shape[1]] = im

    runner = load_runner(
        get_preset(args.preset), args.ckpt_dir, max_new_default=args.max_new
    )
    records = _extract_chunked(runner, batch, args)
    sims = [
        difflib.SequenceMatcher(None, g, r["markdown"]).ratio()
        for g, r in zip(golds, records)
    ]
    result = {
        "pages": len(imgs),
        "data": "golden_png",
        "source": str(pages_dir),
        "markdown_similarity_mean": round(float(np.mean(sims)), 4),
        "markdown_similarity_min": round(float(min(sims)), 4),
    }
    print(json.dumps(result))
    print("\nsample VLM markdown:", records[0]["markdown"][:160].replace("\n", " | "))
    print("sample gold markdown:", golds[0][:160].replace("\n", " | "))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(result, indent=2))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="ocr_bpe")
    parser.add_argument("--ckpt_dir", required=True)
    parser.add_argument("--pages", type=int, default=16)
    parser.add_argument("--seed", type=int, default=12345)
    parser.add_argument("--dpi", type=int, default=46)
    parser.add_argument("--font_size", type=int, default=24)
    parser.add_argument("--lines", type=int, default=6)
    parser.add_argument("--max_new", type=int, default=256)
    parser.add_argument(
        "--data", choices=["words", "real", "golden", "golden_png", "jumble"],
        default="words",
        help="real: held-out real-language prose pages (corpus split never "
        "seen in training) — the VERDICT r2 generalization eval; golden: "
        "prose from the reference's golden combined.md (VCP_GOLDEN_MD), "
        "fully outside every training pool; golden_png: the reference's "
        "OWN page rasters (real 1654x2339 scans, VCP_GOLDEN_PAGES dir) "
        "scored against its extracted markdown — the end-goal eval on "
        "genuinely real documents",
    )
    parser.add_argument(
        "--fonts", default="builtin",
        help="comma list of page fonts rotated per page (pdfgen aliases or "
        ".ttf paths) — evaluates font-diverse reading",
    )
    parser.add_argument(
        "--vocab_cap", type=int, default=0,
        help="jumble word-inventory cap; must match the training cap so "
        "the stage gate measures reading on the same inventory",
    )
    parser.add_argument(
        "--jumble_plain", type=int, default=0,
        help="1: plain jumble pages (no templates/bullets/blank lines); "
        "must match the training distribution",
    )
    parser.add_argument(
        "--chunk", type=int, default=4,
        help="device sub-batch size; each chunk prints a flushed progress "
        "line so supervisor staleness watchdogs see a heartbeat instead "
        "of one silent multi-minute batch (ADVICE r4)",
    )
    parser.add_argument("--json_out", default=None)
    args = parser.parse_args()

    from vision_compression_project_tpu.models import get_preset
    from vision_compression_project_tpu.pipeline.textmd import structure_page
    from vision_compression_project_tpu.raster import PdfDocument, make_pdf
    from vision_compression_project_tpu.train.checkpoint import load_runner
    from vision_compression_project_tpu.train.data import synthetic_page_text

    rng = np.random.default_rng(args.seed)
    if args.data == "golden_png":
        _eval_golden_png(args)
        return
    fonts = [f.strip() for f in args.fonts.split(",") if f.strip()] or ["builtin"]
    page_fonts = [int(rng.integers(0, len(fonts))) for _ in range(args.pages)]
    if args.data in ("real", "golden"):
        from vision_compression_project_tpu.train.corpus import real_page_text

        split = "heldout" if args.data == "real" else "golden"
        texts = [
            real_page_text(
                rng, lines=args.lines, font_size=args.font_size,
                split=split, font=fonts[page_fonts[i]],
            )
            for i in range(args.pages)
        ]
    elif args.data == "jumble":
        # Fresh random word sequences: train-vocab words but unseen order,
        # so similarity here measures READING, with no language prior or
        # corpus memorization to lean on (train/corpus.py::jumble_page_text).
        from vision_compression_project_tpu.train.corpus import (
            jumble_page_text,
        )

        texts = [
            jumble_page_text(
                rng, lines=args.lines, font_size=args.font_size,
                font=fonts[page_fonts[i]], vocab_cap=args.vocab_cap,
                plain=bool(args.jumble_plain),
            )
            for i in range(args.pages)
        ]
    else:
        texts = [
            synthetic_page_text(rng, lines=args.lines)
            for _ in range(args.pages)
        ]
    tmp = Path(tempfile.mkdtemp(prefix="vcp_extract_eval_"))
    pdf = make_pdf(
        texts, tmp / "eval.pdf", font_size=args.font_size,
        fonts=fonts, page_fonts=page_fonts,
    )
    with PdfDocument(pdf) as doc:
        rasters = doc.render_batch(0, args.pages - 1, dpi=args.dpi)
    h = max(r.shape[0] for r in rasters)
    w = max(r.shape[1] for r in rasters)
    pages = np.full((args.pages, h, w, 3), 255, np.uint8)
    for i, r in enumerate(rasters):
        pages[i, : r.shape[0], : r.shape[1]] = r

    runner = load_runner(
        get_preset(args.preset), args.ckpt_dir, max_new_default=args.max_new
    )
    records = _extract_chunked(runner, pages, args)

    def sim(a: str, b: str) -> float:
        return difflib.SequenceMatcher(None, a, b).ratio()

    md_scores, sum_scores, ent_scores = [], [], []
    for text, record in zip(texts, records):
        gold = structure_page(text, record["page_number"])
        md_scores.append(sim(gold["markdown"], record["markdown"]))
        sum_scores.append(sim(gold["summary"], record["summary"]))
        ent_scores.append(
            sim(" ".join(gold["entities"]), " ".join(record["entities"]))
        )

    result = {
        "pages": args.pages,
        "data": args.data,
        "render": {
            "lines": args.lines, "font_size": args.font_size,
            "dpi": args.dpi, "fonts": fonts,
            **({"vocab_cap": args.vocab_cap} if args.data == "jumble" else {}),
        },
        "markdown_similarity_mean": round(float(np.mean(md_scores)), 4),
        "markdown_similarity_min": round(float(min(md_scores)), 4),
        "summary_similarity_mean": round(float(np.mean(sum_scores)), 4),
        "entities_similarity_mean": round(float(np.mean(ent_scores)), 4),
    }
    print(json.dumps(result))
    print("\nsample VLM markdown:", records[0]["markdown"][:160].replace("\n", " | "))
    print("sample gold markdown:",
          structure_page(texts[0], 1)["markdown"][:160].replace("\n", " | "))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

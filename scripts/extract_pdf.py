#!/usr/bin/env python3
"""Full-PDF batch extraction CLI.

Same argparse surface and artifacts as the reference's
scripts/extract_pdf_with_gemini.py (--pdf --dpi --start_page --end_page
--sleep --overwrite; output/pages/page_###.{png,json}, output/manifest.json,
output/combined.md), with the sequential page loop + 1 s/page API pacing
(reference :410-420, :199-200) replaced by batched on-device execution.
--sleep is accepted for surface compatibility and ignored (there is no
external API to pace)."""

import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

from vision_compression_project_tpu.config import resolve_model_preset
from vision_compression_project_tpu.pipeline import extract


def main():
    parser = argparse.ArgumentParser(
        description="Extract and compress PDF pages using the on-device vision pipeline"
    )
    parser.add_argument(
        "--pdf", type=str, default="data/sample.pdf",
        help="Path to PDF file (default: data/sample.pdf)",
    )
    parser.add_argument(
        "--dpi", type=int, default=200,
        help="DPI for image conversion (default: 200)",
    )
    parser.add_argument(
        "--start_page", type=int, default=1,
        help="Start page (1-indexed, default: 1)",
    )
    parser.add_argument(
        "--end_page", type=int, default=None,
        help="End page (1-indexed, default: all pages)",
    )
    parser.add_argument(
        "--sleep", type=float, default=1.0,
        help="Accepted for CLI compatibility; unused (no external API to pace)",
    )
    parser.add_argument(
        "--overwrite", action="store_true",
        help="Overwrite existing JSON files",
    )
    parser.add_argument(
        "--engine", choices=["auto", "text", "vlm"], default=None,
        help="Extraction engine (default: auto)",
    )
    args = parser.parse_args()

    output_dir = Path("output")
    pages_dir = output_dir / "pages"
    stats = extract.extract_pdf_to_page_jsons(
        args.pdf,
        pages_dir,
        images_dir=pages_dir,  # reference CLI keeps PNGs beside JSONs
        dpi=args.dpi,
        start_page=args.start_page,
        end_page=args.end_page,
        overwrite=args.overwrite,
        engine=args.engine,
    )
    print(
        f"Processed {len(stats['processed_pages'])}/{stats['pages_total']} pages; "
        f"{len(stats['failed_pages'])} failed"
    )
    extract.create_manifest(
        args.pdf, output_dir / "manifest.json", stats,
        dpi=args.dpi, start_page=args.start_page, end_page=args.end_page,
        model_name=f"vcp-tpu-{resolve_model_preset()}",
    )
    print(f"Manifest: {output_dir / 'manifest.json'}")
    extract.create_combined_markdown(pages_dir, output_dir / "combined.md")
    print(f"Combined markdown: {output_dir / 'combined.md'}")


if __name__ == "__main__":
    main()

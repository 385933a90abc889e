#!/usr/bin/env python3
"""Headline benchmark: PDF -> structured-JSON ingest throughput per chip.

Measures the full on-device extraction path on the flagship (base) VLM:
C++ batched rasterization -> MXU resize + Pallas normalize/patchify ->
vision encoder -> projector -> LM prefill -> 128 greedy decode steps per
page -> host JSON assembly.  This is the path that replaces the reference's
rasterize -> Gemini-per-page loop (reference backend/app/pipeline/
pdf_extract.py), whose throughput ceiling was API-bound at O(0.1-1)
pages/sec (BASELINE.md); vs_baseline is measured against the favorable end
of that range (1.0 pages/sec).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import tempfile
import time
from pathlib import Path

N_PAGES = 64
BATCH = 32
MAX_NEW = 128
DPI = 150
BASELINE_PAGES_PER_SEC = 1.0  # reference implied ceiling (BASELINE.md)


def main() -> None:
    repo = Path(__file__).resolve().parent
    sys.path.insert(0, str(repo))

    from vision_compression_project_tpu.models import VLMRunner, get_preset
    from vision_compression_project_tpu.raster import PdfDocument, make_pdf

    tmp = Path(tempfile.mkdtemp(prefix="vcp_bench_"))
    pages = [
        f"Benchmark Page {i}\n"
        + "\n".join(
            f"Line {j}: throughput measurement text with several words." for j in range(30)
        )
        for i in range(N_PAGES)
    ]
    pdf = make_pdf(pages, tmp / "bench.pdf")

    import json as json_mod

    from vision_compression_project_tpu.pipeline import extract

    runner = VLMRunner(get_preset("base"), max_new_default=MAX_NEW)

    with PdfDocument(pdf) as doc:
        assert doc.page_count == N_PAGES

    def run_all(out_dir: Path) -> float:
        t0 = time.perf_counter()
        stats = extract.extract_pdf_to_page_jsons(
            pdf, out_dir, images_dir=None, dpi=DPI, engine="vlm",
            batch_size=BATCH, runner=runner, save_images=False,
        )
        elapsed = time.perf_counter() - t0
        assert len(stats["processed_pages"]) == N_PAGES, stats
        record = json_mod.loads((out_dir / "page_001.json").read_text())
        assert set(record) == {"page_number", "markdown", "entities", "summary"}
        return elapsed

    # Warmup compiles every stage on one batch; the timed pass covers all pages.
    stats = extract.extract_pdf_to_page_jsons(
        pdf, tmp / "warmup", images_dir=None, dpi=DPI, engine="vlm",
        batch_size=BATCH, runner=runner, save_images=False, end_page=BATCH,
    )
    assert len(stats["processed_pages"]) == BATCH
    elapsed = run_all(tmp / "timed")

    pages_per_sec = N_PAGES / elapsed
    print(
        json.dumps(
            {
                "metric": "pdf_to_structured_json_ingest_throughput",
                "value": round(pages_per_sec, 3),
                "unit": "pages/sec/chip",
                "vs_baseline": round(pages_per_sec / BASELINE_PAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

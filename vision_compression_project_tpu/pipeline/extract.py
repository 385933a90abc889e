"""PDF -> per-page structured JSON extraction pipeline.

Same public contract and artifact schemas as the reference
(reference: backend/app/pipeline/pdf_extract.py:210-363 —
page_###.json with guaranteed {page_number, markdown, entities, summary},
skip-if-exists resume, failed-page tracking, stats dict
{pages_total, processed_pages, failed_pages}), rebuilt TPU-first:

* page count from the PDF page tree (C++ engine) instead of the 1..1000
  conversion probe (reference pdf_extract.py:243-295);
* rasterization happens for a whole page range at once in the C++ thread
  pool instead of one Poppler subprocess per page (pdf_extract.py:107-122);
* the 5-thread Gemini fan-out (pdf_extract.py:311-333) becomes a device
  *batch* through the Pallas preprocess kernels and the VLM;
* PDFs with a text layer take the deterministic text engine (no model);
  image-only pages take the VLM engine.
"""

from __future__ import annotations

import json
import logging
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config import RUNTIME
from ..raster import PdfDocument
from ..utils.metrics import METRICS
from .textmd import structure_page

logger = logging.getLogger(__name__)

_PAGE_JSON = "page_{:03d}.json"
_PAGE_PNG = "page_{:03d}.png"


def _get_runner():
    """Lazy VLM runner (model init is expensive; serving keeps one warm)."""
    from ..models import VLMRunner, get_preset

    global _RUNNER
    try:
        return _RUNNER
    except NameError:
        from ..config import resolve_checkpoint_dir, resolve_model_preset

        preset = resolve_model_preset()
        cfg = get_preset(preset)
        ckpt = resolve_checkpoint_dir(preset)
        if ckpt:
            from ..train.checkpoint import load_runner

            _RUNNER = load_runner(cfg, ckpt)
        else:
            _RUNNER = VLMRunner(cfg)
        return _RUNNER


def _save_png(img: np.ndarray, path: Path) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


def extract_pdf_to_page_jsons(
    pdf_path,
    out_pages_dir,
    images_dir=None,
    dpi: int = 150,
    start_page: int = 1,
    end_page: Optional[int] = None,
    overwrite: bool = False,
    engine: Optional[str] = None,
    batch_size: Optional[int] = None,
    runner=None,
    save_images: bool = True,
) -> Dict:
    """Extract pages [start_page, end_page] (1-indexed, inclusive) to
    page_###.json files.  Returns {pages_total, processed_pages, failed_pages}
    exactly like the reference (pdf_extract.py:359-363)."""
    pdf_path = Path(pdf_path)
    out_pages_dir = Path(out_pages_dir)
    out_pages_dir.mkdir(parents=True, exist_ok=True)
    if images_dir is not None:
        images_dir = Path(images_dir)
        images_dir.mkdir(parents=True, exist_ok=True)
    engine = engine or RUNTIME.extract_engine
    batch_size = batch_size or RUNTIME.extract_batch_size

    processed_pages: List[int] = []
    failed_pages: List[Dict] = []

    with PdfDocument(pdf_path) as doc:
        pages_total = doc.page_count
        last = pages_total if end_page is None else min(end_page, pages_total)
        first = max(1, start_page)
        todo: List[int] = []
        for page in range(first, last + 1):
            json_path = out_pages_dir / _PAGE_JSON.format(page)
            if json_path.exists() and not overwrite:
                processed_pages.append(page)  # resume semantics
                continue
            todo.append(page)

        if engine == "auto":
            engine = "text" if doc.has_text_layer() else "vlm"
        logger.info(
            "extract: %s pages_total=%d todo=%d engine=%s",
            pdf_path.name, pages_total, len(todo), engine,
        )

        # Pipeline host rasterization (C++ thread pool) against device
        # compute: chunk i+1 renders while chunk i runs on the TPU.
        from concurrent.futures import ThreadPoolExecutor

        chunks = [todo[i : i + batch_size] for i in range(0, len(todo), batch_size)]
        prefetcher = ThreadPoolExecutor(max_workers=1)
        raster_futures = {}

        if engine == "vlm":
            if runner is not None:
                model_image_size = runner.cfg.vision.image_size
            else:
                from ..config import resolve_model_preset
                from ..models.configs import PRESETS

                model_image_size = PRESETS[resolve_model_preset()].vision.image_size
        else:
            model_image_size = None

        def _render(chunk):
            return _render_chunk(
                doc, chunk, dpi, engine, images_dir, save_images, model_image_size
            )

        def _write_records(chunk, records):
            for page, record in zip(chunk, records):
                try:
                    json_path = out_pages_dir / _PAGE_JSON.format(page)
                    json_path.write_text(
                        json.dumps(record, indent=2, ensure_ascii=False),
                        encoding="utf-8",
                    )
                    processed_pages.append(page)
                except Exception as exc:
                    failed_pages.append({"page": page, "error": str(exc)})

        def _fail_chunk(chunk, exc):
            logger.error("extract batch failed: %s", exc, exc_info=True)
            for page in chunk:
                failed_pages.append({"page": page, "error": str(exc)})

        if engine == "vlm" and chunks and runner is None:
            runner = _get_runner()

        if chunks:
            raster_futures[0] = prefetcher.submit(_render, chunks[0])
        # Two-deep device pipeline (VLM engine): batch i+1's host->device
        # transfer + dispatch happen before blocking on batch i's tokens, so
        # transfers hide under decode compute (JAX async dispatch).
        pending = None  # (chunk, handle)

        def _collect_pending():
            nonlocal pending
            if pending is None:
                return
            pchunk, phandle = pending
            pending = None
            try:
                with METRICS.timer("extract.batch"):
                    records = runner.collect_extract(phandle)
                METRICS.count("extract.pages", len(pchunk))
                _write_records(pchunk, records)
            except Exception as exc:
                _fail_chunk(pchunk, exc)

        for ci, chunk in enumerate(chunks):
            if ci + 1 < len(chunks):
                raster_futures[ci + 1] = prefetcher.submit(_render, chunks[ci + 1])
            try:
                rasters = raster_futures.pop(ci).result()
                if engine == "vlm":
                    # Pad ragged (last) chunks to the full batch shape so
                    # every chunk reuses one compiled program; collect trims
                    # back to the real page list.
                    pad = batch_size - len(chunk)
                    if isinstance(rasters, dict) and "glyphs" in rasters:
                        prims = rasters["glyphs"] + [rasters["glyphs"][-1]] * pad
                        handle = runner.extract_batch_async_glyphs(
                            prims, rasters["hw"], page_numbers=chunk
                        )
                    else:
                        stacked = _stack_rasters(rasters, chunk)
                        if pad:
                            stacked = np.concatenate(
                                [stacked, np.repeat(stacked[-1:], pad, axis=0)]
                            )
                        handle = runner.extract_batch_async(
                            stacked, page_numbers=chunk
                        )
                else:
                    with METRICS.timer("extract.batch"):
                        records = _extract_chunk(
                            doc, chunk, dpi, engine, images_dir, runner,
                            save_images, rasters=rasters,
                        )
                    METRICS.count("extract.pages", len(chunk))
                    _write_records(chunk, records)
                    continue
            except Exception as exc:
                _fail_chunk(chunk, exc)
                continue
            _collect_pending()
            pending = (chunk, handle)
        _collect_pending()
        prefetcher.shutdown(wait=False)

    processed_pages.sort()
    return {
        "pages_total": pages_total,
        "processed_pages": processed_pages,
        "failed_pages": failed_pages,
    }


def _model_dpi(doc: PdfDocument, pages: List[int], dpi: int, image_size: int) -> int:
    """DPI that renders the longest page side at ~the model input size: the
    on-device resize would discard anything finer, so rendering finer only
    burns raster time and host->device bandwidth."""
    max_pts = 1.0
    for page in pages:
        w, h = doc.page_size_pts(page - 1)
        max_pts = max(max_pts, w, h)
    return max(36, min(dpi, int(72.0 * image_size / max_pts + 0.999)))


def _render_chunk(
    doc: PdfDocument,
    pages: List[int],
    dpi: int,
    engine: str,
    images_dir: Optional[Path],
    save_images: bool,
    model_image_size: Optional[int] = None,
) -> Optional[Dict[int, np.ndarray]]:
    """Host-side work for a chunk: batched C++ raster (+ PNG artifacts).
    Runs on the prefetch thread, overlapped with device compute."""
    need_artifacts = images_dir is not None and save_images
    if engine != "vlm" and not need_artifacts:
        return None
    render_dpi = dpi
    if engine == "vlm" and not need_artifacts and model_image_size:
        render_dpi = _model_dpi(doc, pages, dpi, model_image_size)
        # Glyph transport: ship drawable primitives (~KB/page) and render on
        # device (ops/glyph_render.py) — unless a page is too dense, in
        # which case fall back to pixel transport for the whole chunk.
        primitives = []
        max_w = max_h = 0
        for page in pages:
            # Pages with image XObjects or embedded-outline fonts cannot be
            # reproduced by the on-device glyph renderer: ship pixels.
            if doc.page_complexity(page - 1) != 0:
                primitives = None
                break
            glyphs, rects = doc.page_primitives(page - 1, dpi=render_dpi)
            if len(glyphs) > 2048 or len(rects) > 64:
                primitives = None
                break
            primitives.append((glyphs, rects))
            w_pts, h_pts = doc.page_size_pts(page - 1)
            max_w = max(max_w, int(w_pts * render_dpi / 72.0 + 0.5))
            max_h = max(max_h, int(h_pts * render_dpi / 72.0 + 0.5))
        if primitives is not None:
            return {"glyphs": primitives, "hw": (max_h, max_w)}
    lo, hi = min(pages) - 1, max(pages) - 1
    if hi - lo + 1 == len(pages) and len(pages) > 1:  # contiguous batch path
        batch = doc.render_batch(lo, hi, dpi=render_dpi)
        rasters = {lo + 1 + j: img for j, img in enumerate(batch)}
    else:
        rasters = {page: doc.render_page(page - 1, dpi=render_dpi) for page in pages}
    if need_artifacts:
        for page, img in rasters.items():
            _save_png(img, images_dir / _PAGE_PNG.format(page))
    return rasters


def _extract_chunk(
    doc: PdfDocument,
    pages: List[int],
    dpi: int,
    engine: str,
    images_dir: Optional[Path],
    runner,
    save_images: bool,
    rasters: Optional[Dict[int, np.ndarray]] = None,
) -> List[Dict]:
    """Process a contiguous-ish set of 1-indexed pages as one device batch."""
    if rasters is None:
        image_size = runner.cfg.vision.image_size if runner is not None else None
        rasters = _render_chunk(
            doc, pages, dpi, engine, images_dir, save_images, image_size
        )

    if engine == "text":
        return [
            structure_page(doc.extract_text(page - 1), page) for page in pages
        ]

    if engine == "vlm":
        runner = runner or _get_runner()
        return runner.extract_batch(
            _stack_rasters(rasters, pages), page_numbers=pages
        )

    raise ValueError(f"unknown extract engine {engine!r}")


def _is_grayscale(img: np.ndarray) -> bool:
    """Exact grayscale check (memory-bound numpy compare, ~ms/page)."""
    return bool(
        np.array_equal(img[..., 0], img[..., 1])
        and np.array_equal(img[..., 1], img[..., 2])
    )


def _stack_rasters(rasters: Dict[int, np.ndarray], pages: List[int]) -> np.ndarray:
    """Stack per-page rasters into one (B, H, W, 3) batch, padding with white
    when page sizes differ (the on-device resize handles the rest).  When
    every page is grayscale, only one channel is stacked — 3x fewer
    host->device bytes; the device broadcasts after resize."""
    gray = all(_is_grayscale(rasters[p]) for p in pages)
    channels = () if gray else (3,)
    shapes = {rasters[p].shape[:2] for p in pages}
    if len(shapes) == 1:
        if gray:
            return np.stack([np.ascontiguousarray(rasters[p][..., 0]) for p in pages])
        return np.stack([rasters[p] for p in pages])
    h = max(s[0] for s in shapes)
    w = max(s[1] for s in shapes)
    stacked = np.full((len(pages), h, w, *channels), 255, np.uint8)
    for j, p in enumerate(pages):
        img = rasters[p]
        src = img[..., 0] if gray else img
        stacked[j, : img.shape[0], : img.shape[1]] = src
    return stacked


# ---------------------------------------------------------------------------
# Batch-CLI artifacts (reference: scripts/extract_pdf_with_gemini.py)
# ---------------------------------------------------------------------------


def create_manifest(
    pdf_path,
    manifest_path,
    stats: Dict,
    dpi: int,
    start_page: int,
    end_page: Optional[int],
    model_name: str,
) -> Dict:
    """manifest.json with the exact key set of the reference CLI
    (reference: scripts/extract_pdf_with_gemini.py:205-223)."""
    manifest = {
        "pdf_path": str(pdf_path),
        "total_pages": stats["pages_total"],
        "processed_pages": stats["processed_pages"],
        "failed_pages": stats["failed_pages"],
        "model_name": model_name,
        "dpi": dpi,
        "start_page": start_page,
        "end_page": end_page if end_page is not None else stats["pages_total"],
        "timestamp": datetime.now().isoformat(),
    }
    Path(manifest_path).write_text(
        json.dumps(manifest, indent=2, ensure_ascii=False), encoding="utf-8"
    )
    return manifest


def create_combined_markdown(pages_dir, out_path) -> Path:
    """combined.md, byte-compatible with the reference CLI's format
    (reference: scripts/extract_pdf_with_gemini.py:226-254): per page,
    '# Page N\\n\\n' + markdown-if-present-else-raw_response + '\\n\\n' +
    '---\\n\\n' (trailing separator included).  raw_response bodies are kept
    verbatim (no fence unwrapping) — that is what the golden fixture
    /root/reference/output/combined.md contains."""
    import re

    pages_dir = Path(pages_dir)
    parts: List[str] = []
    for json_path in sorted(pages_dir.glob("page_*.json")):
        try:
            data = json.loads(json_path.read_text(encoding="utf-8"))
        except Exception:
            continue
        match = re.search(r"page_(\d+)\.json$", json_path.name)
        page_no = int(match.group(1)) if match else data.get("page_number", 0)
        parts.append(f"# Page {page_no}\n\n")
        if "markdown" in data:
            parts.append(f"{data['markdown']}\n\n")
        elif "raw_response" in data:
            parts.append(f"{data['raw_response']}\n\n")
        parts.append("---\n\n")
    out_path = Path(out_path)
    out_path.write_text("".join(parts), encoding="utf-8")
    return out_path

import json

import pytest

from vision_compression_project_tpu.models import VLMRunner, get_preset
from vision_compression_project_tpu.pipeline import extract
from vision_compression_project_tpu.raster import make_pdf


@pytest.fixture(scope="module")
def tiny_runner():
    return VLMRunner(get_preset("tiny"), max_new_default=12)


@pytest.mark.slow
def test_vlm_engine_pipeline(tmp_path, tiny_runner):
    """Full extract with the VLM engine (async two-deep pipeline) across
    multiple batches."""
    pdf = make_pdf([f"Page {i} text." for i in range(5)], tmp_path / "d.pdf")
    stats = extract.extract_pdf_to_page_jsons(
        pdf, tmp_path / "pages", dpi=72, engine="vlm",
        batch_size=2, runner=tiny_runner, save_images=False,
    )
    assert stats["pages_total"] == 5
    assert stats["processed_pages"] == [1, 2, 3, 4, 5]
    assert stats["failed_pages"] == []
    for page in range(1, 6):
        record = json.loads(
            (tmp_path / "pages" / f"page_{page:03d}.json").read_text()
        )
        assert set(record) == {"page_number", "markdown", "entities", "summary"}
        assert record["page_number"] == page


@pytest.mark.slow
def test_vlm_engine_failure_tracking(tmp_path, tiny_runner, monkeypatch):
    """A failing device batch marks only its pages as failed (reference
    failed-page semantics, pdf_extract.py:343-350)."""
    pdf = make_pdf([f"Page {i}" for i in range(4)], tmp_path / "d.pdf")
    calls = {"n": 0}
    orig = tiny_runner.collect_extract

    def flaky(handle):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected device failure")
        return orig(handle)

    monkeypatch.setattr(tiny_runner, "collect_extract", flaky)
    stats = extract.extract_pdf_to_page_jsons(
        pdf, tmp_path / "pages", dpi=72, engine="vlm",
        batch_size=2, runner=tiny_runner, save_images=False,
    )
    assert [f["page"] for f in stats["failed_pages"]] == [1, 2]
    assert stats["processed_pages"] == [3, 4]
    # Retry (resume) picks up only the failed pages and succeeds.
    stats2 = extract.extract_pdf_to_page_jsons(
        pdf, tmp_path / "pages", dpi=72, engine="vlm",
        batch_size=2, runner=tiny_runner, save_images=False,
    )
    assert stats2["processed_pages"] == [1, 2, 3, 4]
    assert stats2["failed_pages"] == []

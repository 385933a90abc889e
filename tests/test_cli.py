import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"


def _run(args, cwd):
    env = dict(os.environ)
    env["VCP_PLATFORM"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    proc = subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-1000:]
    return proc.stdout


@pytest.fixture(scope="module")
def cli_workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli")
    (ws / "data").mkdir()
    sys.path.insert(0, str(REPO))
    from vision_compression_project_tpu.raster import make_pdf

    make_pdf(
        [
            "Energy Review\nBatteries store renewable energy efficiently.",
            "Grid Systems\nTransmission lines carry power across regions.",
        ],
        ws / "data" / "sample.pdf",
    )
    return ws


@pytest.mark.slow
def test_cli_full_flow(cli_workspace):
    ws = cli_workspace
    out = _run(
        [SCRIPTS / "extract_pdf.py", "--pdf", "data/sample.pdf", "--dpi", "72"],
        cwd=ws,
    )
    assert "Processed 2/2 pages" in out
    manifest = json.loads((ws / "output" / "manifest.json").read_text())
    assert manifest["total_pages"] == 2
    assert set(manifest) == {
        "pdf_path", "total_pages", "processed_pages", "failed_pages",
        "model_name", "dpi", "start_page", "end_page", "timestamp",
    }
    assert (ws / "output" / "pages" / "page_001.json").exists()
    assert (ws / "output" / "pages" / "page_001.png").exists()
    assert (ws / "output" / "combined.md").exists()

    out = _run(
        [SCRIPTS / "ingest_to_index.py", "--pdf_path", "data/sample.pdf"],
        cwd=ws,
    )
    assert "doc_id='sample'" in out
    assert "Smoke test query" in out
    sm = json.loads((ws / "output" / "supermemory_manifest.json").read_text())
    assert set(sm) == {"doc_id", "pdf_path", "pages", "failed_pages", "created_at"}
    assert len(sm["pages"]) == 2

    out = _run(
        [
            SCRIPTS / "qa_query.py",
            "--question", "How is renewable energy stored?",
            "--rewrite_query",
        ],
        cwd=ws,
    )
    assert "(sample p.1" in out
    answers = list((ws / "output" / "answers").glob("*_answer.md"))
    assert len(answers) == 1
    text = answers[0].read_text()
    assert "# Question" in text and "# Answer" in text
    assert "# Retrieved Pages (for debugging)" in text


def test_cli_extract_page(cli_workspace):
    ws = cli_workspace
    out = _run(
        [SCRIPTS / "extract_page.py", "--pdf", "data/sample.pdf", "--dpi", "72"],
        cwd=ws,
    )
    assert "Saved JSON" in out
    record = json.loads((ws / "output" / "page_1.json").read_text())
    assert set(record) == {"page_number", "markdown", "entities", "summary"}
    assert (ws / "output" / "page_1.png").exists()


@pytest.mark.slow
def test_curriculum_driver_dry_run(tmp_path):
    """The unattended curriculum driver plans the full hop chain, persists
    resumable state, and chains warm-starts stage to stage."""
    out = _run(
        [
            SCRIPTS / "run_curriculum.py", "--out", tmp_path / "curr",
            "--dry_run", "--init_from", "checkpoints/r3/hopA",
        ],
        cwd=REPO,
    )
    assert "--init_from checkpoints/r3/hopA" in out      # stage 1 warm start
    # Read-first plan: jumble dive stages precede the prose stages.
    assert "--data jumble" in out and "--data real" in out
    assert "--jumble_frac 0.5" in out                    # mixC anti-shortcut mix
    assert "--font_size 12" in out and "--dpi 150" in out  # target render
    state = json.loads((tmp_path / "curr" / "curriculum.json").read_text())
    assert state["status"] == "complete"
    assert [h["stage"] for h in state["history"]] == [
        "readA00", "readA0", "readA1", "readA", "readB", "mixC", "denseD",
        "fontsE",
    ]
    # Warm-start chain: each stage's ckpt dir carries its own stage name,
    # and the driver threads init_from through the history order.
    assert "readA1_e0" in state["history"][2]["ckpt"]
    assert "readB_e0" in state["history"][4]["ckpt"]
    # Resume on a complete state is a no-op that still reports shipping.
    out2 = _run(
        [
            SCRIPTS / "run_curriculum.py", "--out", tmp_path / "curr",
            "--dry_run", "--resume",
        ],
        cwd=REPO,
    )
    assert "NOT shipped" in out2 or "SHIPPED" in out2

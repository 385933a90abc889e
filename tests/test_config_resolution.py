"""Shipped-checkpoint resolution (config.resolve_model_preset /
resolve_checkpoint_dir / shipped_meta): VCP_MODEL_PRESET=auto picks the
best preset with committed weights, explicit env always wins."""

import dataclasses
import json

from vision_compression_project_tpu import config


def _set_runtime(monkeypatch, **kw):
    monkeypatch.setattr(
        config, "RUNTIME", dataclasses.replace(config.RUNTIME, **kw)
    )


def _fake_root(tmp_path, monkeypatch, presets=("ocr_bpe",)):
    root = tmp_path / "default"
    for p in presets:
        d = root / p / "params_00000042"
        d.mkdir(parents=True, exist_ok=True)
        (d / "x").write_text("w")
        (root / p / "meta.json").write_text(
            json.dumps({"preset": p, "font_size": 24, "dpi": 46, "lines": 6})
        )
    monkeypatch.setattr(config, "SHIPPED_CHECKPOINT_ROOT", root)
    return root


def test_auto_prefers_shipped_preset(tmp_path, monkeypatch):
    _fake_root(tmp_path, monkeypatch)
    _set_runtime(monkeypatch, model_preset="auto", checkpoint_dir=None)
    assert config.resolve_model_preset() == "ocr_bpe"
    assert config.resolve_checkpoint_dir("ocr_bpe").endswith("ocr_bpe")
    assert config.shipped_meta("ocr_bpe")["font_size"] == 24


def test_auto_falls_back_to_tiny(tmp_path, monkeypatch):
    monkeypatch.setattr(config, "SHIPPED_CHECKPOINT_ROOT", tmp_path / "none")
    _set_runtime(monkeypatch, model_preset="auto", checkpoint_dir=None)
    assert config.resolve_model_preset() == "tiny"
    assert config.resolve_checkpoint_dir("tiny") is None
    assert config.shipped_meta("tiny") == {}


def test_explicit_preset_and_ckpt_win(tmp_path, monkeypatch):
    _fake_root(tmp_path, monkeypatch)
    _set_runtime(monkeypatch, model_preset="base", checkpoint_dir="/my/ckpt")
    assert config.resolve_model_preset() == "base"
    assert config.resolve_checkpoint_dir("base") == "/my/ckpt"


def test_preference_order(tmp_path, monkeypatch):
    _fake_root(tmp_path, monkeypatch, presets=("ocr_bpe", "base"))
    _set_runtime(monkeypatch, model_preset="auto", checkpoint_dir=None)
    assert config.resolve_model_preset() == "base"


# -- engine 'auto' -> 'lm' flip (VERDICT r2 item 4) --------------------------


def _meta_with_tasks(tmp_path, monkeypatch, tasks):
    root = _fake_root(tmp_path, monkeypatch)
    meta_file = root / "ocr_bpe" / "meta.json"
    meta = json.loads(meta_file.read_text())
    if tasks is not None:
        meta["tasks"] = tasks
    meta_file.write_text(json.dumps(meta))
    return root


def test_auto_engine_flips_to_lm_when_answer_trained(tmp_path, monkeypatch):
    from vision_compression_project_tpu.pipeline.qa import lm_answer_available

    _meta_with_tasks(tmp_path, monkeypatch, ["extract", "answer"])
    _set_runtime(monkeypatch, model_preset="auto", checkpoint_dir=None)
    assert lm_answer_available() is True


def test_auto_engine_extractive_without_answer_training(tmp_path, monkeypatch):
    from vision_compression_project_tpu.pipeline.qa import lm_answer_available

    _meta_with_tasks(tmp_path, monkeypatch, ["extract"])
    _set_runtime(monkeypatch, model_preset="auto", checkpoint_dir=None)
    assert lm_answer_available() is False
    # No tasks declared at all -> conservative extractive.
    _meta_with_tasks(tmp_path, monkeypatch, None)
    assert lm_answer_available() is False


def test_auto_engine_extractive_without_checkpoint(tmp_path, monkeypatch):
    from vision_compression_project_tpu.pipeline.qa import lm_answer_available

    monkeypatch.setattr(config, "SHIPPED_CHECKPOINT_ROOT", tmp_path / "none")
    _set_runtime(monkeypatch, model_preset="auto", checkpoint_dir=None)
    assert lm_answer_available() is False


def test_answer_preset_decoupled_from_extract_preset(tmp_path, monkeypatch):
    """Shipping a better page-reader (ocr_real, extract-only) must not
    downgrade /chat: the answer engine resolves its OWN preset — the best
    shipped checkpoint declaring answer training."""
    from vision_compression_project_tpu.pipeline.qa import lm_answer_available

    root = _fake_root(tmp_path, monkeypatch, presets=("ocr_real", "ocr_bpe"))
    for p, tasks in (("ocr_real", ["extract"]), ("ocr_bpe", ["extract", "answer"])):
        f = root / p / "meta.json"
        meta = json.loads(f.read_text())
        meta["tasks"] = tasks
        f.write_text(json.dumps(meta))
    _set_runtime(monkeypatch, model_preset="auto", checkpoint_dir=None)
    assert config.resolve_model_preset() == "ocr_real"  # best page-reader
    preset, ckpt = config.resolve_answer_preset()
    assert preset == "ocr_bpe" and ckpt.endswith("ocr_bpe")
    assert lm_answer_available() is True
    # VCP_ANSWER_PRESET forces a specific answer model.
    monkeypatch.setenv("VCP_ANSWER_PRESET", "ocr_real")
    assert config.resolve_answer_preset() is None  # forced preset lacks it
    monkeypatch.setenv("VCP_ANSWER_PRESET", "ocr_bpe")
    assert config.resolve_answer_preset()[0] == "ocr_bpe"


def test_auto_engine_explicit_ckpt_reads_its_meta(tmp_path, monkeypatch):
    from vision_compression_project_tpu.pipeline.qa import lm_answer_available

    ckpt = tmp_path / "run"
    (ckpt / "params_00000001").mkdir(parents=True)
    _set_runtime(monkeypatch, model_preset="ocr_bpe", checkpoint_dir=str(ckpt))
    assert lm_answer_available() is False  # no meta.json -> conservative
    (ckpt / "meta.json").write_text(json.dumps({"tasks": ["answer"]}))
    assert lm_answer_available() is True

    # The shipped ocr_bpe checkpoint passed the real-language answer-hop
    # gate (scripts/run_answer_hop.py: beats the extractive engine on
    # held-out aggregation questions, holds the imitate/extract floors),
    # so it declares `answer` and a fresh clone's /chat default GENERATES.
    _set_runtime(monkeypatch, model_preset="auto", checkpoint_dir=None)
    if config.shipped_checkpoint_dir("ocr_bpe"):
        tasks = config.shipped_meta("ocr_bpe").get("tasks", ())
        assert "answer" in tasks
        assert lm_answer_available() is True

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
        d.mkdir(parents=True)
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

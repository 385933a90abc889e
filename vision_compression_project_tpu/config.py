"""Framework configuration.

Keeps the reference's request-visible defaults identical
(reference: backend/app/config.py:56-60 — DPI 150, start_page 1, top_k 8,
max_chars_per_page 1500; scripts default DPI 200,
scripts/extract_pdf_with_gemini.py:271) while replacing the external-API
configuration (Gemini/Supermemory keys, reference config.py:23-33) with
on-device model/mesh configuration.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional

from .utils.env import load_env_chain

load_env_chain()

# ---------------------------------------------------------------------------
# Request-surface defaults (identical to the reference API surface).
# ---------------------------------------------------------------------------
DEFAULT_DPI = 150            # backend default (reference config.py:57)
SCRIPTS_DEFAULT_DPI = 200    # CLI default (reference extract_pdf_with_gemini.py:271)
DEFAULT_START_PAGE = 1
DEFAULT_TOP_K = 8
DEFAULT_MAX_CHARS_PER_PAGE = 1500
EXCERPT_CHARS = 250          # retrieved-page excerpt length (reference qa.py:289)
TRUNCATION_MARKER = "... [truncated]"

# Answer-generation budget (reference config.py:26-28).
MAX_OUTPUT_TOKENS_EXTRACTION = 2048
MAX_OUTPUT_TOKENS_ANSWERING = 8192
GENERATION_TEMPERATURE = 0.0

# The extraction instruction retained for provenance in artifacts; the
# on-device VLM is structurally constrained to this schema rather than
# prompted (reference config.py:44-54 used prompting).
EXTRACTION_SCHEMA_KEYS = ("page_number", "markdown", "entities", "summary")

# ---------------------------------------------------------------------------
# On-device configuration (replaces the reference's cloud-API config).
# ---------------------------------------------------------------------------

def _env_str(name: str, default: str) -> str:
    return os.environ.get(name, default)


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Process-wide runtime knobs, overridable via environment."""

    # Extraction engine: "auto" (text layer if present, else vlm), "text", "vlm".
    extract_engine: str = _env_str("VCP_EXTRACT_ENGINE", "auto")
    # Answering engine: "auto" (extractive compose; LM if weights loaded), "extractive", "lm".
    answer_engine: str = _env_str("VCP_ANSWER_ENGINE", "auto")
    # Retrieval mode: "single" (one pooled vector/page) or "multi"
    # (ColPali-style multi-vector MaxSim, index/multivector.py).
    retrieval_mode: str = _env_str("VCP_RETRIEVAL", "single")
    # Embedding backend: "hash" (deterministic hashed n-gram projection) or "neural".
    embed_backend: str = _env_str("VCP_EMBED_BACKEND", "hash")
    embed_dim: int = _env_int("VCP_EMBED_DIM", 512)
    # Model preset name (see models/configs.py); "auto" = the best preset
    # shipped trained weights exist for (resolve_model_preset), else tiny.
    model_preset: str = _env_str("VCP_MODEL_PRESET", "auto")
    # Optional checkpoint directory for trained weights.
    checkpoint_dir: Optional[str] = os.environ.get("VCP_CHECKPOINT_DIR")
    # Device batch size for page extraction / embedding.
    extract_batch_size: int = _env_int("VCP_EXTRACT_BATCH", 16)
    embed_batch_size: int = _env_int("VCP_EMBED_BATCH", 32)
    # Mesh axis sizes; 0 = infer from available devices (all -> data).
    mesh_data: int = _env_int("VCP_MESH_DATA", 0)
    mesh_model: int = _env_int("VCP_MESH_MODEL", 1)
    # Index storage root (replaces the Supermemory cloud index).
    index_root: str = _env_str("VCP_INDEX_ROOT", "tmp/_index")
    # Sharded retrieval: '1' force, '0' disable, 'auto' = shard when >1 device.
    index_sharded: str = _env_str("VCP_INDEX_SHARDED", "auto")


RUNTIME = RuntimeConfig()

# ---------------------------------------------------------------------------
# Shipped (in-repo) checkpoints: trained weights committed under
# checkpoints/default/<preset>/params_NNNNNNNN/.  When VCP_CHECKPOINT_DIR is
# unset, serving auto-loads the shipped checkpoint for the active preset, so
# a fresh clone answers with trained weights out of the box (the reference
# shipped no weights at all — its models were cloud APIs).
# ---------------------------------------------------------------------------
SHIPPED_CHECKPOINT_ROOT = (
    Path(__file__).resolve().parents[1] / "checkpoints" / "default"
)

# Resolution order for VCP_MODEL_PRESET=auto: prefer the largest preset a
# shipped checkpoint exists for.
_PRESET_PREFERENCE = ("prod", "base", "ocr_real", "ocr_bpe", "ocr_demo", "tiny")


def shipped_checkpoint_dir(preset: str) -> Optional[str]:
    d = SHIPPED_CHECKPOINT_ROOT / preset
    return str(d) if d.is_dir() and any(d.glob("params_*")) else None


def resolve_model_preset() -> str:
    """RUNTIME.model_preset, with "auto" meaning 'the best preset we ship
    trained weights for, else tiny'."""
    preset = RUNTIME.model_preset
    if preset != "auto":
        return preset
    for name in _PRESET_PREFERENCE:
        if shipped_checkpoint_dir(name):
            return name
    return "tiny"


def resolve_checkpoint_dir(preset: str) -> Optional[str]:
    """Explicit VCP_CHECKPOINT_DIR wins; else the shipped checkpoint."""
    return RUNTIME.checkpoint_dir or shipped_checkpoint_dir(preset)


def resolve_answer_preset() -> Optional[tuple]:
    """(preset, ckpt_dir) of the best shipped checkpoint that declares
    answer-task training in its meta — the model the QA engine loads for
    generated answers.  Decoupled from the extraction preset: the best
    page-reader (e.g. ocr_real) and the best answerer (e.g. ocr_bpe,
    trained multitask on evidence-pack answering) can be different
    checkpoints, each serving its own engine.  VCP_ANSWER_PRESET forces a
    specific preset; explicit VCP_CHECKPOINT_DIR (with a meta.json
    declaring 'answer') wins over shipped weights."""
    if RUNTIME.checkpoint_dir:
        try:
            import json

            meta = json.loads(
                (Path(RUNTIME.checkpoint_dir) / "meta.json").read_text()
            )
        except (OSError, ValueError):
            meta = {}
        if "answer" in meta.get("tasks", ()):
            return resolve_model_preset(), RUNTIME.checkpoint_dir
        return None
    forced = os.environ.get("VCP_ANSWER_PRESET")
    names = (forced,) if forced else _PRESET_PREFERENCE
    for name in names:
        d = shipped_checkpoint_dir(name)
        if d and "answer" in shipped_meta(name).get("tasks", ()):
            return name, d
    return None


def shipped_meta(preset: str) -> dict:
    """Training-rendering metadata written by scripts/ship_checkpoint.py
    (font_size / dpi / lines the weights were trained on); {} if absent."""
    f = SHIPPED_CHECKPOINT_ROOT / preset / "meta.json"
    try:
        import json

        return json.loads(f.read_text())
    except (OSError, ValueError):
        return {}

# Base directory for the service's per-document artifacts (reference main.py:46).
BASE_TMP_DIR = Path(os.environ.get("VCP_TMP_DIR", "tmp"))

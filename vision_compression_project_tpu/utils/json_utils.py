"""Tolerant JSON helpers.

Behavior-parity with the reference's fence-strip-and-parse utilities
(reference: backend/app/pipeline/utils.py:10-53): legacy artifacts store model
output wrapped in markdown code fences (```json ... ```), and page JSONs come
in two shapes ({page_number, raw_response} and the normalized
{page_number, markdown, entities, summary}).  These helpers let the new
framework read every legacy artifact.  New artifacts never need them: the
constrained decoder emits valid JSON by construction.
"""

from __future__ import annotations

import json
from typing import Any, Optional


def strip_code_fences(text: str) -> str:
    """Remove a leading ```/```json fence and a trailing ``` fence if present."""
    if not isinstance(text, str):
        return text
    s = text.strip()
    if s.startswith("```"):
        first_newline = s.find("\n")
        if first_newline != -1:
            s = s[first_newline + 1 :]
        else:
            s = ""
    if s.rstrip().endswith("```"):
        s = s.rstrip()
        s = s[: -3]
    return s.strip()


def safe_json_loads(text: str) -> Optional[Any]:
    """Parse JSON after stripping code fences; return None on failure."""
    if text is None:
        return None
    if not isinstance(text, str):
        return None
    candidate = strip_code_fences(text)
    if not candidate:
        return None
    try:
        return json.loads(candidate)
    except (json.JSONDecodeError, ValueError):
        pass
    # Salvage: find the outermost {...} span (models sometimes prepend prose).
    start = candidate.find("{")
    end = candidate.rfind("}")
    if start != -1 and end > start:
        try:
            return json.loads(candidate[start : end + 1])
        except (json.JSONDecodeError, ValueError):
            return None
    return None

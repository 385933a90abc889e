"""Shared kernel helpers."""

from __future__ import annotations

import jax


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def interpret_mode() -> bool:
    """Pallas kernels compile natively on TPU; elsewhere (CPU test meshes)
    they run in interpreter mode so the same code path is exercised."""
    try:
        return jax.default_backend() != "tpu"
    except RuntimeError:
        return True

"""Shared CLI bootstrap: repo-root imports + logging."""

import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")

# Optional platform override (e.g. VCP_PLATFORM=cpu for hardware-free runs);
# must land in jax.config before any backend initializes.
import os  # noqa: E402

if os.environ.get("VCP_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["VCP_PLATFORM"])

# Persistent XLA compilation cache: training/eval CLIs relaunch as fresh
# processes per curriculum hop; without this every hop repays the full
# train-step compile (minutes through the TPU tunnel).  Override the
# location with JAX_COMPILATION_CACHE_DIR; VCP_NO_COMPILE_CACHE=1 disables.
if not os.environ.get("VCP_NO_COMPILE_CACHE"):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", str(REPO_ROOT / ".jax_cache")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

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

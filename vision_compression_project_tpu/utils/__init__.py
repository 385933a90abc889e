from .json_utils import strip_code_fences, safe_json_loads
from .retry import retry
from .dirs import ensure_dirs
from .env import load_env_chain

__all__ = [
    "strip_code_fences",
    "safe_json_loads",
    "retry",
    "ensure_dirs",
    "load_env_chain",
]

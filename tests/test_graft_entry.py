"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 shipped 102 green tests while the driver's dryrun_multichip failed
on the 1-chip bench host (MULTICHIP_r01.json rc=1) because nothing tested
the entry file itself.  These tests invoke it exactly as the driver does,
in subprocesses, covering both the already-provisioned path and the
self-provisioning re-exec path.
"""

import os
import subprocess
import sys
from pathlib import Path
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host

REPO = Path(__file__).resolve().parent.parent


def _run(env: dict, n: int) -> subprocess.CompletedProcess:
    return subprocess.run(
        [
            sys.executable,
            "-c",
            f"import __graft_entry__; __graft_entry__.dryrun_multichip({n})",
        ],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )


def test_dryrun_multichip_with_enough_devices():
    """Provisioned host (8 virtual CPU devices): runs in-process."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = _run(env, 8)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
    # Every claimed mesh axis must be exercised >1 somewhere in the matrix.
    for axis in ("data", "seq", "expert", "model"):
        assert axis in proc.stdout.split("axes>1=")[1], proc.stdout


def test_dryrun_multichip_self_provisions():
    """1-device host (the MULTICHIP_r01 failure mode): must re-exec itself
    onto a virtual 8-device CPU mesh instead of asserting."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # No forced device count: the parent process sees ONE cpu device.
    env.pop("XLA_FLAGS", None)
    env.pop("_VCP_DRYRUN_CHILD", None)
    proc = _run(env, 8)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_compiles_single_chip():
    """entry() must return a jittable forward + example args."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"  # boot hook may pin axon
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "print('entry OK', out.shape)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "entry OK" in proc.stdout

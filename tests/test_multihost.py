"""Multi-host (DCN) validation (VERDICT r2 item 8): two OS processes join
through `initialize_multihost`, build ONE global mesh whose data axis spans
both processes, and run sharded VLM train steps — collectives ride the
Gloo-backed CPU cross-process backend, the same jax.distributed path real
multi-slice TPU deployments use over DCN.
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_train_steps():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # A fresh cache dir would recompile; share the repo one if bootstrapped.
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m",
                    "vision_compression_project_tpu.parallel.multihost_demo",
                    "--coordinator", f"localhost:{port}",
                    "--num_processes", "2",
                    "--process_id", str(pid),
                    "--model", "2",
                    "--steps", "3",
                ],
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
        assert f"over 8 devices (2 processes x 4 local)" in out, out

    # Both processes observe the SAME replicated loss sequence, and it
    # decreases — the gradient psum crossed the process boundary.
    seqs = []
    for out in outs:
        losses = [float(m) for m in re.findall(r"loss ([0-9.]+)", out)]
        assert len(losses) == 3, out
        seqs.append(losses)
    assert seqs[0] == seqs[1], seqs
    assert seqs[0][-1] < seqs[0][0], seqs

"""bench.py supervisor layer: the round-5 guarantee that a wedged TPU
tunnel can never again erase the round's benchmark evidence (BENCH_r04
recorded rc=124/parsed=null).  These tests never touch jax — the
supervisor path under test is exactly the one the driver's bare
`python bench.py` takes."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(env_extra, timeout=120):
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "VCP_PLATFORM")
    }
    # Isolated lock file: the supervisor acquires/releases the chip lock
    # even on fallback paths, and tests must never clobber a live pilot's.
    env.setdefault("VCP_CHIP_LOCK", "/tmp/vcp_test_chip.lock")
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    return proc


def test_dead_tunnel_prints_fallback_json_quickly():
    t0 = time.time()
    proc = _run_bench({
        "VCP_PROBE_CMD": "false",          # probe fails instantly
        "VCP_BENCH_TOTAL_TIMEOUT": "60",
        "VCP_BENCH_NO_PREEMPT": "1",
    })
    elapsed = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected ONE JSON line, got {proc.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "pdf_to_structured_json_ingest_throughput"
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert rec["error"] == "tpu_unreachable"
    assert elapsed < 100, f"fallback took {elapsed:.0f}s (must be fast)"


def test_hung_probe_is_bounded_by_total_budget():
    t0 = time.time()
    proc = _run_bench({
        "VCP_PROBE_CMD": "sleep 600",      # probe hangs like a dead tunnel
        "VCP_BENCH_TOTAL_TIMEOUT": "45",
        "VCP_BENCH_NO_PREEMPT": "1",
    })
    elapsed = time.time() - t0
    assert proc.returncode == 0
    rec = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][0]
    )
    assert rec["error"] == "tpu_unreachable"
    assert elapsed < 120


def _isolated_chip_lock(tmp_path):
    """Import chip_lock against a throwaway lock path — tests must never
    touch the live pilot's checkpoints/chip.lock."""
    import importlib

    sys.path.insert(0, str(REPO / "scripts"))
    os.environ["VCP_CHIP_LOCK"] = str(tmp_path / "chip.lock")
    try:
        import chip_lock

        return importlib.reload(chip_lock)
    finally:
        del os.environ["VCP_CHIP_LOCK"]


def test_chip_lock_preempt_kills_holder_group(tmp_path):
    chip_lock = _isolated_chip_lock(tmp_path)

    victim = subprocess.Popen(
        ["sleep", "300"], start_new_session=True,
        stdout=subprocess.DEVNULL,
    )
    try:
        chip_lock.acquire("test", pgid=victim.pid, pid=victim.pid)
        info = chip_lock.holder()
        assert info and info["tag"] == "test"
        preempted = chip_lock.preempt(grace_s=0.2)
        assert preempted and preempted["pid"] == victim.pid
        assert victim.wait(timeout=10) == -signal.SIGKILL
        assert chip_lock.holder() is None
    finally:
        try:
            os.killpg(victim.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass


def test_stale_lock_of_dead_pid_is_ignored(tmp_path):
    chip_lock = _isolated_chip_lock(tmp_path)

    proc = subprocess.Popen(["true"])
    proc.wait()
    chip_lock.acquire("dead", pgid=proc.pid, pid=proc.pid)
    assert chip_lock.holder() is None  # stale entry cleaned
    assert chip_lock.wait(timeout_s=1)

#!/usr/bin/env python3
"""Single-chip access lock for the axon TPU tunnel.

The one v5e chip sits behind a loopback tunnel that wedges when two
clients touch it concurrently (round-4 incident: an overlapped client
hung the remote server for every later client — docs/ROUND3_STATUS.md,
VERDICT r4).  Everything that executes on the chip therefore takes this
advisory lock:

  * the training pilot (scripts/round5_pilot.sh) locks around each
    watched workload, recording the workload's PGID;
  * bench.py's supervisor PREEMPTS the lock at round end — the graded
    artifact outranks training, and every pilot workload is restart-safe
    by design (warm-start from its own newest checkpoint), so a SIGKILL
    costs at most --ckpt_every steps.

The lock is a JSON file under checkpoints/ (gitignored).  A lock whose
pid is dead is stale and is ignored/overwritten.  CLI:

  python scripts/chip_lock.py acquire --tag train --pgid 1234
  python scripts/chip_lock.py release
  python scripts/chip_lock.py status      # prints holder JSON or "free"
  python scripts/chip_lock.py wait        # blocks while a live holder exists
  python scripts/chip_lock.py preempt     # SIGKILL the holder's pgid + clear
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# VCP_CHIP_LOCK overrides the lock path (tests use a tmp file so they
# never clobber a live pilot's lock).
LOCK = Path(os.environ.get("VCP_CHIP_LOCK", REPO / "checkpoints" / "chip.lock"))


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def holder() -> dict | None:
    """The live lock holder, or None (missing/corrupt/stale locks clear)."""
    try:
        info = json.loads(LOCK.read_text())
    except (OSError, ValueError):
        return None
    if not _pid_alive(int(info.get("pid", -1))):
        try:
            LOCK.unlink()
        except OSError:
            pass
        return None
    return info


def acquire(tag: str, pgid: int | None = None, pid: int | None = None) -> None:
    """Record this workload as the chip holder (advisory; no blocking)."""
    LOCK.parent.mkdir(parents=True, exist_ok=True)
    pid = pid if pid is not None else os.getpid()
    LOCK.write_text(
        json.dumps(
            {
                "tag": tag,
                "pid": pid,
                "pgid": pgid if pgid is not None else os.getpgid(pid),
                "ts": time.time(),
            }
        )
    )


def release() -> None:
    try:
        LOCK.unlink()
    except OSError:
        pass


def wait(poll_s: float = 10.0, timeout_s: float | None = None) -> bool:
    """Block while a live holder exists.  True = lock free."""
    t0 = time.time()
    while holder() is not None:
        if timeout_s is not None and time.time() - t0 > timeout_s:
            return False
        time.sleep(poll_s)
    return True


def preempt(grace_s: float = 5.0) -> dict | None:
    """SIGKILL the holder's process group and clear the lock.

    Returns the preempted holder's info, or None if the lock was free.
    Safe against self-kill: refuses to signal our own process group.
    """
    info = holder()
    if info is None:
        return None
    pgid = int(info.get("pgid", 0))
    if pgid > 1 and pgid != os.getpgid(os.getpid()):
        try:
            os.killpg(pgid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
    release()
    time.sleep(grace_s)
    return info


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "cmd", choices=["acquire", "release", "status", "wait", "preempt"]
    )
    parser.add_argument("--tag", default="cli")
    parser.add_argument("--pgid", type=int, default=None)
    parser.add_argument("--pid", type=int, default=None)
    parser.add_argument("--timeout", type=float, default=None)
    args = parser.parse_args()
    if args.cmd == "acquire":
        acquire(args.tag, pgid=args.pgid, pid=args.pid)
    elif args.cmd == "release":
        release()
    elif args.cmd == "status":
        info = holder()
        print(json.dumps(info) if info else "free")
    elif args.cmd == "wait":
        ok = wait(timeout_s=args.timeout)
        return 0 if ok else 1
    elif args.cmd == "preempt":
        info = preempt()
        print(json.dumps(info) if info else "free")
    return 0


if __name__ == "__main__":
    sys.exit(main())

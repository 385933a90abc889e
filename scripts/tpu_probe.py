#!/usr/bin/env python3
"""One-shot TPU liveness probe: exits 0 iff a trivial op completes.

The axon tunnel to the single v5e chip can wedge (round-3 incident:
docs/ROUND3_STATUS.md; round-4: two overlapping clients hung the remote
server).  Training supervisors call this in a subprocess with a hard
timeout before (re)launching work, so a dead tunnel costs seconds, not a
hung training run."""

import sys


def main() -> int:
    import os

    if os.environ.get("VCP_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["VCP_PLATFORM"])

    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    # A CPU/GPU fallback must NOT pass: a pilot whose probe silently fell
    # back to CPU would launch a full training run on the 1-core host and
    # make steady (glacial) log progress the watchdog never flags
    # (ADVICE r4).  VCP_PROBE_ALLOW_CPU=1 opts out for hardware-free tests.
    if not os.environ.get("VCP_PROBE_ALLOW_CPU") and any(
        d.platform in ("cpu", "gpu") for d in devs
    ):
        print(f"probe FAIL: non-TPU backend {devs}", flush=True)
        return 1
    x = jnp.ones((256, 256))
    v = float((x @ x).sum())
    print(f"tpu ok: {devs} sum={v}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

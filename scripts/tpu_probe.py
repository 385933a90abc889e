#!/usr/bin/env python3
"""One-shot TPU liveness probe: exits 0 iff a trivial op completes.

The axon tunnel to the single v5e chip can wedge (round-3 incident:
docs/ROUND3_STATUS.md; round-4: two overlapping clients hung the remote
server).  Training supervisors call this in a subprocess with a hard
timeout before (re)launching work, so a dead tunnel costs seconds, not a
hung training run."""

import sys


def main() -> int:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    v = float((x @ x).sum())
    print(f"tpu ok: {jax.devices()} sum={v}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

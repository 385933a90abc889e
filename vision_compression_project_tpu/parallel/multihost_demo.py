"""Multi-host (DCN) launch recipe: one process per host, one global mesh.

The reference scales by adding Cloud Run instances behind HTTPS (reference:
backend/deploy_cloud_build.ps1); the TPU-native equivalent is a multi-process
JAX job where every host calls `initialize_multihost` and then builds ONE
global mesh spanning all slices — the `data` axis lands across DCN (gradient
psum once per step tolerates slow links), `model`/`expert`/`seq` stay inside
each slice on ICI (see docs/SCALING.md).

Run one process per host (identical command apart from --process_id):

    python -m vision_compression_project_tpu.parallel.multihost_demo \
        --coordinator <host0-ip>:9876 --num_processes 2 --process_id $I \
        --model 2 --steps 3

On real slices JAX discovers TPU topology; for CI / single-machine validation
set JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=N
per process (tests/test_multihost.py does exactly this, proving the
multi-process path constructs the global mesh and runs sharded train steps
over Gloo-backed CPU collectives).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", required=True,
                        help="host:port of process 0 (jax.distributed)")
    parser.add_argument("--num_processes", type=int, required=True)
    parser.add_argument("--process_id", type=int, required=True)
    parser.add_argument("--model", type=int, default=1,
                        help="TP axis size (must divide local device count)")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()

    import jax

    # Deployment images may pin jax_platforms via boot hooks; the env var is
    # the per-process source of truth here (mirrors tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from .mesh import MeshConfig, build_mesh, initialize_multihost

    initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == args.num_processes * n_local, (n_global, n_local)
    mesh = build_mesh(MeshConfig(model=args.model))
    print(
        f"proc {args.process_id}: mesh {dict(mesh.shape)} over {n_global} "
        f"devices ({args.num_processes} processes x {n_local} local)",
        flush=True,
    )
    # The data axis must span processes — that is the DCN claim under test.
    data_rows = {
        d.process_index
        for d in mesh.devices[:, 0, 0, 0].flatten()
    }
    assert len(data_rows) == args.num_processes, (
        f"data axis stays inside processes {data_rows}; DCN never exercised"
    )

    from ..models import get_preset
    from ..models.tokenizer import PAD_ID
    from ..train.train_step import make_jitted_train_step, make_train_state

    cfg = get_preset("tiny")
    # Every process runs the same SPMD program on the same seed: init lands
    # sharded over the global mesh, batches are assembled from process-local
    # shards (the only host->device path that exists multi-host).
    model, tx, state, shardings = make_train_state(cfg, mesh, lr=1e-2)
    step_fn, batch_shardings = make_jitted_train_step(model, tx, mesh, shardings)

    rng = np.random.default_rng(0)
    grid, patch_dim = cfg.vision.grid, cfg.vision.patch ** 2 * 3
    ids = rng.integers(0, 255, size=(args.batch, 16)).astype(np.int32)
    ids[:, -3:] = PAD_ID
    host_batch = {
        "patch_tokens": rng.standard_normal(
            (args.batch, grid * grid, patch_dim)
        ).astype(np.float32),
        "token_ids": ids,
    }

    def globalize(name, arr):
        sharding = batch_shardings[name]
        # Each process owns the batch rows its devices carry.
        n_rows = arr.shape[0] // args.num_processes
        local = arr[args.process_id * n_rows:(args.process_id + 1) * n_rows]
        return jax.make_array_from_process_local_data(sharding, local)

    batch = {k: globalize(k, v) for k, v in host_batch.items()}
    with mesh:
        for step in range(1, args.steps + 1):
            state, loss = step_fn(state, batch)
            # loss is fully replicated -> addressable on every process.
            print(
                f"proc {args.process_id}: step {step} loss "
                f"{float(jax.device_get(loss)):.6f}",
                flush=True,
            )
    print(f"proc {args.process_id}: MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()

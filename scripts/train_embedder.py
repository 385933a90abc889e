#!/usr/bin/env python3
"""Contrastive training CLI for the neural embedder (InfoNCE on
query/page pairs); writes orbax checkpoints loadable by NeuralEmbedder."""

import argparse
import time

import _bootstrap  # noqa: F401


def main():
    parser = argparse.ArgumentParser(description="Train the neural embedder.")
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("--ckpt_dir", default="checkpoints/embedder")
    parser.add_argument("--log_every", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vision_compression_project_tpu.models.configs import EmbedderConfig
    from vision_compression_project_tpu.train.checkpoint import save_checkpoint
    from vision_compression_project_tpu.train.embedder_train import (
        embedder_train_step,
        make_embedder_train_state,
        synthetic_pair_batches,
    )

    cfg = EmbedderConfig(dim=args.dim, depth=args.depth)
    model, tx, params, opt_state = make_embedder_train_state(
        cfg, lr=args.lr, seed=args.seed
    )
    step_fn = jax.jit(
        lambda p, o, b: embedder_train_step(model, tx, p, o, b)
    )
    data = synthetic_pair_batches(args.batch, seed=args.seed)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = {k: jnp.asarray(v) for k, v in next(data).items()}
        params, opt_state, loss = step_fn(params, opt_state, batch)
        if step % args.log_every == 0 or step == 1:
            print(
                f"step {step:5d}  loss {float(loss):.4f}  "
                f"pairs/s {step*args.batch/(time.time()-t0):.0f}"
            )
    path = save_checkpoint(args.ckpt_dir, {"params": params}, step=args.steps)
    print(f"checkpoint: {path}")


if __name__ == "__main__":
    main()

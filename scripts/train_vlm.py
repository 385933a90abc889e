#!/usr/bin/env python3
"""Train the OpticalVLM on synthetic rendered-page OCR data.

The reference had no training path at all (SURVEY.md: models were cloud
APIs).  This CLI runs the pjit-sharded train step (DP/TP/EP/SP per
parallel/sharding.py) over the synthetic page corpus and writes orbax
checkpoints that VLMRunner loads for the serving VLM engine
(VCP_CHECKPOINT_DIR)."""

import argparse
import time

import _bootstrap  # noqa: F401


def main():
    parser = argparse.ArgumentParser(description="Train the OpticalVLM.")
    parser.add_argument("--preset", default="tiny", help="model preset")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--text_len", type=int, default=384)
    parser.add_argument("--dpi", type=int, default=72)
    parser.add_argument("--font_size", type=int, default=12)
    parser.add_argument("--lines", type=int, default=18)
    parser.add_argument(
        "--data",
        choices=["words", "words_easy", "codes", "codes_easy", "real",
                 "jumble"],
        default="words",
        help="codes: random digit pages — loss below ln(10)/digit proves "
        "OCR; jumble: independently random corpus words (real-language "
        "glyphs, no language prior to shortcut through)",
    )
    parser.add_argument(
        "--jumble_frac", type=float, default=0.0,
        help="with --data real: fraction of pages drawn from the jumble "
        "generator instead, keeping the reading gradient alive while the "
        "model learns prose (anti-memorization mix)",
    )
    parser.add_argument(
        "--fonts", default="builtin",
        help="comma list of page fonts to rotate per page: 'builtin' "
        "(engine atlas) and/or pdfgen aliases (dejavu_sans, dejavu_serif, "
        "dejavu_mono, ...) or .ttf paths — font-diverse OCR training",
    )
    parser.add_argument(
        "--vocab_cap", type=int, default=0,
        help="jumble word-inventory cap (0 = full ~14k corpus vocab): the "
        "read-dive ramp — small caps (128/1024) concentrate the reading "
        "gradient so the vision circuit forms, later stages widen",
    )
    parser.add_argument(
        "--jumble_plain", type=int, default=0,
        help="1: strip structural extras (Value templates, bullets, blank "
        "lines) from jumble pages — dive stages get dense reading signal "
        "and no generation attractor",
    )
    parser.add_argument("--code_groups", type=int, default=3)
    parser.add_argument("--code_digits", type=int, default=5)
    parser.add_argument("--ckpt_dir", default="checkpoints/vlm")
    parser.add_argument("--ckpt_every", type=int, default=100)
    parser.add_argument("--log_every", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--init_from", default=None,
        help="checkpoint dir to warm-start params from (curriculum transfer)",
    )
    parser.add_argument(
        "--pp_microbatches", type=int, default=0,
        help="if > 0, pipeline the decoder blocks over the mesh `model` axis"
        " (GPipe) with this many microbatches per step; needs a uniform"
        " decoder (dense or expert_every=1) and batch %% microbatches == 0",
    )
    args = parser.parse_args()

    import jax

    from vision_compression_project_tpu.models import get_preset
    from vision_compression_project_tpu.parallel import local_mesh
    from vision_compression_project_tpu.train import save_checkpoint
    from vision_compression_project_tpu.train.data import (
        device_batch,
        prefetch_batches,
        synthetic_batches,
    )
    from vision_compression_project_tpu.train.train_step import (
        cosine_lr,
        make_jitted_train_step,
        make_train_state,
    )

    cfg = get_preset(args.preset)
    mesh = local_mesh()  # honors VCP_MESH_* (e.g. VCP_MESH_MODEL for PP/TP)
    print(f"mesh: {dict(mesh.shape)} devices={len(jax.devices())}")
    # Warmup-cosine to 10% of peak: constant peak lr leaves the late-run
    # Adam noise floor high — teacher-forced loss converges but greedy
    # generation stays misaligned (round-5 readA0 measurement).
    schedule = cosine_lr(args.lr, args.steps)
    model, tx, state, shardings = make_train_state(cfg, mesh, lr=schedule)
    if args.init_from:
        from vision_compression_project_tpu.train.checkpoint import load_runner

        runner = load_runner(cfg, args.init_from)
        state = type(state)(
            params=jax.device_put(runner.params, shardings),
            opt_state=state.opt_state,
            step=state.step,
        )
        print(f"warm-started params from {args.init_from}")
    if args.pp_microbatches > 0:
        from vision_compression_project_tpu.train.pp_train import (
            make_pp_vlm_train_step,
        )

        if args.batch % args.pp_microbatches:
            parser.error("--batch must be divisible by --pp_microbatches")
        step_fn, batch_shardings = make_pp_vlm_train_step(
            cfg, tx, mesh, n_micro=args.pp_microbatches
        )
        print(f"PP training: {args.pp_microbatches} microbatches over "
              f"{mesh.shape['model']} pipeline stage(s)")
    else:
        step_fn, batch_shardings = make_jitted_train_step(
            model, tx, mesh, shardings
        )

    data = prefetch_batches(
        synthetic_batches(
            cfg, args.batch, text_len=args.text_len, dpi=args.dpi,
            seed=args.seed, font_size=args.font_size, lines=args.lines,
            kind=args.data, code_groups=args.code_groups,
            code_digits=args.code_digits, jumble_frac=args.jumble_frac,
            fonts=[f.strip() for f in args.fonts.split(",") if f.strip()],
            vocab_cap=args.vocab_cap, jumble_plain=bool(args.jumble_plain),
        )
    )
    t_start = time.time()
    t_last, step_last = t_start, 0
    with mesh:
        for step in range(1, args.steps + 1):
            batch = device_batch(cfg, next(data))
            batch = {
                k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()
            }
            state, loss = step_fn(state, batch)
            if step % args.log_every == 0 or step == 1:
                loss_v = float(jax.device_get(loss))
                now = time.time()
                rate = step * args.batch / (now - t_start)
                # marginal rate since the last log line: the steady-state
                # number (cumulative is dragged down by compile time)
                inst = (step - step_last) * args.batch / max(now - t_last, 1e-9)
                t_last, step_last = now, step
                print(
                    f"step {step:5d}  loss {loss_v:.4f}  pages/s {rate:.1f}"
                    f"  (inst {inst:.1f})", flush=True,
                )
            if args.ckpt_every and step % args.ckpt_every == 0:
                path = save_checkpoint(args.ckpt_dir, state)
                print(f"checkpoint: {path}")
    path = save_checkpoint(args.ckpt_dir, state)
    print(f"final checkpoint: {path}")


if __name__ == "__main__":
    main()

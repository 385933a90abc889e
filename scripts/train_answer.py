#!/usr/bin/env python3
"""Multi-task fine-tune: page extraction + evidence-pack answering.

Warm-starts from an OCR checkpoint (scripts/train_vlm.py) and alternates
extraction batches (rendered pages -> structured fields) with answer
batches (question + evidence -> cited markdown), so ONE checkpoint serves
both the /ingest VLM engine and the /chat LM answer engine
(VCP_ANSWER_ENGINE=lm) — the reference used one Gemini for both
(reference: backend/app/pipeline/pdf_extract.py:146-166, qa.py:189-217)."""

import argparse
import time

import _bootstrap  # noqa: F401


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="ocr_bpe")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--text_len", type=int, default=320)
    parser.add_argument("--dpi", type=int, default=46)
    parser.add_argument("--font_size", type=int, default=24)
    parser.add_argument("--lines", type=int, default=6)
    parser.add_argument(
        "--answer_every", type=int, default=2,
        help="every Nth step trains the answer task (others: extraction)",
    )
    parser.add_argument(
        "--agg_frac", type=float, default=0.0,
        help="fraction of answer examples from the cross-page AGGREGATION "
        "generator (counts/totals/superlatives the extractive engine "
        "cannot produce; train/data.py::_synthetic_agg_qa_example)",
    )
    parser.add_argument(
        "--qa_data", choices=["words", "real", "mixed"], default="words",
        help="evidence-sentence distribution for the answer task: 'real' "
        "uses the real-language corpus (what /chat sees at serve time), "
        "'mixed' alternates 50/50 (train/data.py::qa_batches)",
    )
    parser.add_argument("--init_from", default=None)
    parser.add_argument("--ckpt_dir", default="checkpoints/vlm_qa")
    parser.add_argument("--ckpt_every", type=int, default=500)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from vision_compression_project_tpu.models import get_preset
    from vision_compression_project_tpu.parallel import local_mesh
    from vision_compression_project_tpu.train import save_checkpoint
    from vision_compression_project_tpu.train.data import (
        device_batch,
        prefetch_batches,
        qa_batches,
        synthetic_batches,
    )
    from vision_compression_project_tpu.train.train_step import (
        cosine_lr,
        make_jitted_train_step,
        make_train_state,
    )

    cfg = get_preset(args.preset)
    mesh = local_mesh()  # honors VCP_MESH_*
    print(f"mesh: {dict(mesh.shape)} devices={len(jax.devices())}")
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
    step_fn, batch_shardings = make_jitted_train_step(model, tx, mesh, shardings)

    extract_data = prefetch_batches(
        synthetic_batches(
            cfg, args.batch, text_len=args.text_len, dpi=args.dpi,
            seed=args.seed, font_size=args.font_size, lines=args.lines,
        )
    )
    answer_data = prefetch_batches(
        qa_batches(
            cfg, args.batch, text_len=args.text_len, seed=args.seed + 7,
            agg_frac=args.agg_frac, data_kind=args.qa_data,
        )
    )
    t_start = time.time()
    ex_loss = ans_loss = float("nan")
    with mesh:
        for step in range(1, args.steps + 1):
            is_answer = args.answer_every and step % args.answer_every == 0
            batch = device_batch(
                cfg, next(answer_data if is_answer else extract_data)
            )
            batch = {
                k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()
            }
            state, loss = step_fn(state, batch)
            if is_answer:
                ans_loss = loss
            else:
                ex_loss = loss
            if step % args.log_every == 0 or step == 1:
                ex_v = float(jax.device_get(ex_loss))
                ans_v = float(jax.device_get(ans_loss))
                rate = step * args.batch / (time.time() - t_start)
                print(
                    f"step {step:5d}  extract {ex_v:.4f}  answer {ans_v:.4f}"
                    f"  ex/s {rate:.1f}", flush=True,
                )
            if args.ckpt_every and step % args.ckpt_every == 0:
                print(f"checkpoint: {save_checkpoint(args.ckpt_dir, state)}")
    print(f"final checkpoint: {save_checkpoint(args.ckpt_dir, state)}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generated-answer quality: does the LM answer engine reproduce the
extractive teacher on FRESH synthetic QA examples?

The answer task (scripts/train_answer.py) supervises the LM with the
extractive engine's exact cited-markdown format (train/data.py::
_synthetic_qa_example) — the serve-time contract of /chat with
VCP_ANSWER_ENGINE=lm (the reference generated its answers with an 8192-
token LLM budget, reference backend/app/pipeline/qa.py:189-217).  Reports
SequenceMatcher similarity of generated vs teacher answers plus the rate
of well-formed citations."""

import argparse
import difflib
import re

import _bootstrap  # noqa: F401

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="ocr_bpe")
    parser.add_argument("--ckpt_dir", required=True)
    def _positive_int(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--examples must be >= 1")
        return n

    parser.add_argument("--examples", type=_positive_int, default=16)
    parser.add_argument("--seed", type=int, default=4242)
    parser.add_argument("--max_new", type=int, default=128)
    args = parser.parse_args()

    from vision_compression_project_tpu.models import get_preset
    from vision_compression_project_tpu.train.checkpoint import load_runner
    from vision_compression_project_tpu.train.data import _synthetic_qa_example

    rng = np.random.default_rng(args.seed)
    examples = [_synthetic_qa_example(rng) for _ in range(args.examples)]

    runner = load_runner(
        get_preset(args.preset), args.ckpt_dir, max_new_default=args.max_new
    )
    sims, cited = [], 0
    sample = None
    for question, evidence, teacher in examples:
        got = runner.answer(question, evidence).strip()
        sims.append(difflib.SequenceMatcher(None, teacher, got).ratio())
        if re.search(r"\(doc p\.\d+\)", got):
            cited += 1
        if sample is None:
            sample = (question, teacher, got)
    print(
        f"answer similarity over {args.examples} fresh examples: "
        f"mean={np.mean(sims):.3f} min={min(sims):.3f} max={max(sims):.3f}"
    )
    print(f"citation well-formed rate: {cited}/{args.examples}")
    q, t, g = sample
    print(f"\nsample question: {q}")
    print(f"teacher: {t!r}")
    print(f"generated: {g!r}")


if __name__ == "__main__":
    main()

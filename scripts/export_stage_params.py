#!/usr/bin/env python3
"""Export the curriculum's current resume point as a tracked params-only
checkpoint.

Round 3 lost its dive checkpoint (checkpoints/r3/hopA) because training
state lived only on the round's ephemeral disk (docs/ROUND3_STATUS.md —
the next round started on a fresh machine).  This exports the NEWEST
stage checkpoint recorded in <curr>/curriculum.json to
<out>/<stage>_e<ext>/ as a params-only orbax dir (no optimizer moments,
~1/3 the size) that IS tracked by git, so `run_curriculum --init_from`
can warm-start the dive on any future machine.

Exports only when the resume point changed (marker file), so repeated
supervisor loops don't bloat git history."""

import argparse
import json
from pathlib import Path

import _bootstrap  # noqa: F401


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--curr", required=True, help="curriculum out dir")
    parser.add_argument("--out", required=True, help="tracked export root")
    parser.add_argument("--preset", default="ocr_real")
    args = parser.parse_args()

    curr = Path(args.curr)
    state_file = curr / "curriculum.json"
    if not state_file.exists():
        print("no curriculum state; nothing to export")
        return 0
    from vision_compression_project_tpu.train.checkpoint import complete_steps

    state = json.loads(state_file.read_text())
    src = state.get("init_from")
    # Prefer the newest stage dir that actually holds COMPLETE checkpoints
    # (complete_steps skips SIGKILL-interrupted *.orbax-checkpoint-tmp-*
    # partials — ADVICE r4): after a mid-stage crash the stage's own
    # partial checkpoint is newer than the last completed run recorded in
    # init_from.
    candidates = [p for p in curr.glob("*_e*") if complete_steps(p, "step")]
    if candidates:
        newest = max(
            candidates,
            key=lambda p: max(
                q.stat().st_mtime for q in complete_steps(p, "step")
            ),
        )
        src = str(newest)
    if not src or not Path(src).exists():
        print(f"resume point missing: {src}")
        return 0
    src = Path(src)
    steps = complete_steps(src, "step")
    tag = src.name
    step_n = int(steps[-1].name.split("_")[1]) if steps else 0

    out = Path(args.out)
    marker = out / "exported.json"
    prev = {}
    if marker.exists():
        prev = json.loads(marker.read_text())
    if prev.get("tag") == tag and prev.get("step") == step_n:
        print(f"already exported: {tag} step {step_n}")
        return 0

    from vision_compression_project_tpu.models import get_preset
    from vision_compression_project_tpu.train.checkpoint import (
        load_runner,
        save_params,
    )

    cfg = get_preset(args.preset)
    runner = load_runner(cfg, str(src.resolve()))
    dest = out / tag
    path = save_params(dest, runner.params, step=step_n)
    # drop older CURRICULUM exports (stage_eN dirs): one resume seed is
    # enough, git history keeps the rest.  Non-stage exports (e.g. the
    # rescued bpe_boost weights) are not ours to prune.
    import re as _re
    import shutil

    for p in out.iterdir():
        if p.is_dir() and p != dest and _re.fullmatch(r".+_e\d+", p.name):
            shutil.rmtree(p)
    marker.write_text(
        json.dumps(
            {"tag": tag, "step": step_n, "preset": args.preset,
             "src": str(src), "state": {k: state.get(k) for k in
                                        ("stage", "extension", "status")}},
            indent=1,
        )
    )
    print(f"exported: {path}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""Orbax checkpointing for model/optimizer state.

The reference's only 'checkpointing' was file-existence resume over
artifacts (reference: backend/app/pipeline/pdf_extract.py:92-100); model
state had nothing to checkpoint (cloud APIs).  Here trained weights persist
via Orbax and are restored into VLMRunner / NeuralEmbedder pytrees.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def complete_steps(ckpt_dir, prefix: str = "step") -> list[Path]:
    """COMPLETE `<prefix>_NNN` checkpoint dirs, sorted by step.

    A SIGKILLed save (the pilot watchdog kills training groups mid-write)
    leaves `<prefix>_NNN.orbax-checkpoint-tmp-<ts>` partials; a bare
    `glob("step_*")` matches those, so int(...) parsing raised and resume
    could target an unrestorable dir (ADVICE r4).  Only exact
    `<prefix>_<digits>` names count.
    """
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():  # missing, or a stray file matching a glob
        return []
    pat = re.compile(rf"{prefix}_\d+")
    return sorted(
        p for p in ckpt_dir.iterdir()
        if p.is_dir() and pat.fullmatch(p.name)
    )


def save_checkpoint(ckpt_dir, state: Any, step: Optional[int] = None) -> Path:
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if step is None:
        step = int(jax.device_get(getattr(state, "step", 0)))
    path = ckpt_dir / f"step_{step:08d}"
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, state, force=True)
    checkpointer.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    # .resolve(): orbax refuses relative paths at restore time, so every
    # checkpoint-consuming CLI must be usable with `--ckpt_dir checkpoints/x`.
    ckpt_dir = Path(ckpt_dir).resolve()
    if not ckpt_dir.exists():
        return None
    steps = complete_steps(ckpt_dir, "step")
    return steps[-1] if steps else None


def restore_checkpoint(ckpt_dir, target: Any) -> Optional[Any]:
    """Restore the latest checkpoint into the structure of `target`
    (a pytree of arrays, e.g. an abstract state from eval_shape)."""
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return None
    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(path, target)


def save_params(ckpt_dir, params, step: int = 0) -> Path:
    """Params-only serving checkpoint (~1/3 the size of a TrainState one:
    no fp32 optimizer moments) — the format for committed/shipped weights."""
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"params_{step:08d}"
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, params, force=True)
    checkpointer.wait_until_finished()
    return path


def latest_params(ckpt_dir) -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir).resolve()
    if not ckpt_dir.exists():
        return None
    steps = complete_steps(ckpt_dir, "params")
    return steps[-1] if steps else None


def load_runner(cfg, ckpt_dir, **runner_kwargs):
    """Build a VLMRunner with params restored from the latest checkpoint —
    a params-only serving checkpoint (params_NNN) or a full TrainState one
    (step_NNN), whichever is present (falls back to fresh init)."""
    import jax

    from ..models.vlm import VLMRunner
    from .train_step import TrainState, make_optimizer

    runner = VLMRunner(cfg, **runner_kwargs)
    params_path = latest_params(ckpt_dir)
    if params_path is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), runner.params
        )
        checkpointer = ocp.StandardCheckpointer()
        runner.params = checkpointer.restore(params_path, abstract)
        return runner
    if latest_checkpoint(ckpt_dir) is None:
        return runner
    abstract_params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), runner.params
    )
    # TrainState checkpoints differ in opt_state tree shape depending on
    # whether the run used a constant lr (EmptyState) or an lr schedule
    # (ScaleByScheduleState) — round-5 cosine runs added the latter.  Try
    # both templates; only params are kept either way.
    last_err = None
    for lr in (3e-4, lambda _step: 3e-4):
        tx = make_optimizer(lr)
        abstract = TrainState(
            params=abstract_params,
            opt_state=jax.eval_shape(tx.init, runner.params),
            step=jax.ShapeDtypeStruct((), "int32"),
        )
        try:
            restored = restore_checkpoint(ckpt_dir, abstract)
        except ValueError as e:  # opt_state tree mismatch: other layout
            last_err = e
            continue
        if restored is not None:
            runner.params = restored.params
        return runner
    raise last_err

import jax
import numpy as np

from vision_compression_project_tpu.models import get_preset
from vision_compression_project_tpu.models.tokenizer import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    SEP_ID,
    TASK_EXTRACT_ID,
)
import pytest

from vision_compression_project_tpu.train.data import (
    device_batch,
    synthetic_batches,
    synthetic_page_text,
    target_tokens,
)


def test_synthetic_page_text_deterministic():
    a = synthetic_page_text(np.random.default_rng(7))
    b = synthetic_page_text(np.random.default_rng(7))
    assert a == b
    assert len(a.splitlines()) == 19


def test_target_tokens_structure():
    text = "Title Here\nFirst sentence about Models.\nSecond sentence."
    toks = target_tokens(text, page_number=1, max_len=256)
    lst = toks.tolist()
    assert lst[0] == BOS_ID and lst[1] == TASK_EXTRACT_ID
    assert SEP_ID in lst
    assert EOS_ID in lst
    # Everything after EOS is padding.
    eos_at = lst.index(EOS_ID)
    assert all(t == PAD_ID for t in lst[eos_at + 1 :])


def test_synthetic_batches_and_device_batch(tmp_path):
    cfg = get_preset("tiny")
    it = synthetic_batches(cfg, batch_size=2, text_len=128, dpi=36, workdir=tmp_path)
    batch = next(it)
    assert batch["pages_u8"].dtype == np.uint8
    assert batch["pages_u8"].shape[0] == 2
    assert batch["token_ids"].shape == (2, 128)
    dev = device_batch(cfg, batch)
    grid = cfg.vision.grid
    assert dev["patch_tokens"].shape == (2, grid * grid, cfg.vision.patch ** 2 * 3)


@pytest.mark.slow
def test_train_on_synthetic_data_reduces_loss(mesh_dp, tmp_path):
    from vision_compression_project_tpu.train.train_step import (
        make_jitted_train_step,
        make_train_state,
    )

    cfg = get_preset("tiny")
    model, tx, state, shardings = make_train_state(cfg, mesh_dp, lr=3e-3)
    step_fn, batch_shardings = make_jitted_train_step(model, tx, mesh_dp, shardings)
    it = synthetic_batches(cfg, batch_size=8, text_len=128, dpi=36, workdir=tmp_path)
    batch = device_batch(cfg, next(it))
    batch = {k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()}
    with mesh_dp:
        state, loss0 = step_fn(state, batch)
        for _ in range(6):
            state, loss = step_fn(state, batch)
    assert float(loss) < float(loss0)


def test_load_runner_roundtrip(tmp_path, mesh_dp):
    from vision_compression_project_tpu.train import save_checkpoint
    from vision_compression_project_tpu.train.checkpoint import load_runner
    from vision_compression_project_tpu.train.train_step import make_train_state

    cfg = get_preset("tiny")
    model, tx, state, _ = make_train_state(cfg, mesh_dp, lr=1e-3)
    save_checkpoint(tmp_path / "ck", state, step=1)
    runner = load_runner(cfg, tmp_path / "ck")
    trained = np.asarray(jax.device_get(state.params["proj"]["kernel"]))
    loaded = np.asarray(jax.device_get(runner.params["proj"]["kernel"]))
    np.testing.assert_array_equal(trained, loaded)


def test_prefetch_batches_matches_and_propagates_errors():
    from vision_compression_project_tpu.train.data import prefetch_batches

    def gen():
        for i in range(5):
            yield {"i": np.full((2,), i)}

    got = [b["i"][0] for b in prefetch_batches(gen(), depth=2)]
    assert got == [0, 1, 2, 3, 4]

    def bad():
        yield {"i": np.zeros(1)}
        raise RuntimeError("boom")

    it = prefetch_batches(bad(), depth=1)
    next(it)
    try:
        next(it)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "boom" in str(e)


def test_agg_qa_example_facts_and_format():
    """Aggregation QA (VERDICT r2 item 4): the answer states a cross-page
    aggregate that appears in NO evidence sentence (so the extractive
    engine cannot produce it), with every supporting page cited."""
    import re

    from vision_compression_project_tpu.train.data import (
        _synthetic_agg_qa_example,
    )

    rng = np.random.default_rng(7)
    seen = set()
    for _ in range(40):
        q, ev, ans, facts = _synthetic_agg_qa_example(rng)
        seen.add(facts["kind"])
        assert ans.startswith("Based on the retrieved pages (doc p.")
        assert re.search(rf"\b{facts['value']}\b", ans)
        for p in facts["cited"]:
            assert f"p.{p}" in ans
        claim = ans.split("- ", 1)[1].rsplit(" (", 1)[0]
        assert claim not in ev  # the aggregate is nowhere in the evidence
        if facts["kind"] == "count":
            # ground truth really is the number of mentioning pages
            n_mention = sum(
                "module is covered" in s for s in ev.split("\n\n---\n\n")
            )
            assert facts["value"] == len(facts["cited"]) <= n_mention
        if facts["kind"] == "max":
            assert facts["name"] in ans.lower()
    assert seen == {"count", "sum", "max"}


def test_qa_batches_agg_frac_mixes_examples():
    from vision_compression_project_tpu.train.data import qa_batches

    cfg = get_preset("tiny")
    batch = next(iter(qa_batches(cfg, 4, text_len=256, seed=0, agg_frac=1.0)))
    assert batch["token_ids"].shape == (4, 256)
    assert batch["loss_mask"].sum() > 0
    # answer span is supervised, prompt is not
    first_supervised = int(np.argmax(batch["loss_mask"][0] > 0))
    assert first_supervised > 10

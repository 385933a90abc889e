"""Answer-task supervision on REAL-language evidence (round-3 follow-up).

The round-3 measurement: an answer model trained only on word-soup
evidence ignores real-language evidence at serve time.  These tests pin
the generator properties that make the real-evidence hop trainable:
the target sentence must survive tokenization budgets (resample-on-
overflow), and the question must be derivable from real prose.
"""

import numpy as np

from vision_compression_project_tpu.models import get_preset
from vision_compression_project_tpu.models.tokenizer import PAD_ID
import pytest

from vision_compression_project_tpu.train.data import (
    _synthetic_agg_qa_example,
    _synthetic_qa_example,
    qa_batches,
    qa_sentence_pool,
)


def test_qa_sentence_pool_is_real_prose():
    pool = qa_sentence_pool("train")
    assert len(pool) > 500
    assert all(len(s) <= 120 for s in pool)
    # Real prose, not the 28-word soup: vocabulary far exceeds 28 words.
    vocab = {w.lower() for s in pool[:500] for w in s.split()}
    assert len(vocab) > 300


def test_real_evidence_contains_target_sentence():
    pool = qa_sentence_pool("train")
    rng = np.random.default_rng(11)
    for _ in range(8):
        q, ev, ans = _synthetic_qa_example(rng, sentence_pool=pool)
        # The teacher claim is quoted from the evidence pack verbatim.
        claim = ans.split("\n\n- ", 1)[1].rsplit(" (doc p.", 1)[0]
        assert claim in ev
        assert q.startswith("What about ") and q.endswith("?")


def test_agg_real_evidence_keeps_programmatic_facts():
    pool = qa_sentence_pool("train")
    rng = np.random.default_rng(5)
    for _ in range(8):
        q, ev, ans, facts = _synthetic_agg_qa_example(rng, sentence_pool=pool)
        assert str(facts["value"]) in ans
        for p in facts["cited"]:
            assert f"[Page {p} " in ev


def test_qa_batches_real_evidence_fits_budget():
    """Resample-on-overflow: the supervised answer span is always intact
    (ends in EOS before text_len), never truncated mid-answer."""
    from vision_compression_project_tpu.models.tokenizer import EOS_ID

    cfg = get_preset("tiny")
    it = qa_batches(cfg, 8, text_len=256, seed=2, agg_frac=0.5, data_kind="real")
    batch = next(it)
    toks, mask = batch["token_ids"], batch["loss_mask"]
    assert toks.shape == (8, 256)
    for i in range(8):
        span = np.nonzero(mask[i])[0]
        assert span.size > 0
        # Last supervised token is EOS (the answer completed inside budget).
        assert toks[i, span[-1]] == EOS_ID
        # Nothing supervised after EOS; tail is padding.
        assert np.all(toks[i, span[-1] + 1 :] == PAD_ID)


def test_qa_batches_mixed_draws_both_distributions():
    cfg = get_preset("tiny")
    it = qa_batches(cfg, 16, text_len=256, seed=9, data_kind="mixed")
    next(it)  # builds without error; pool load is cached process-wide


@pytest.mark.slow
def test_decode_budget_clamped_to_context():
    """A max_new larger than the remaining context must be truncated, not
    allowed to wrap the KV cache (clamped dynamic_update_slice writes
    silently corrupt the last slot past max_seq)."""
    import numpy as np

    from vision_compression_project_tpu.models import VLMRunner, get_preset

    runner = VLMRunner(get_preset("tiny"), max_new_default=8)
    max_seq = runner.cfg.decoder.max_seq  # tiny: 512
    pages = np.full((1, 64, 64, 3), 255, np.uint8)
    # Request far more decode budget than the context can hold.
    records = runner.extract_batch(
        pages, page_numbers=[1], max_new=10 * max_seq
    )
    assert len(records) == 1  # completed without cache wrap / crash

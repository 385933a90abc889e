"""BPE tokenizer: roundtrip, specials compatibility, mask, model wiring."""

import numpy as np
import pytest

from vision_compression_project_tpu.models.tokenizer import (
    BPETokenizer,
    ByteTokenizer,
    DEFAULT_MERGES_PATH,
    EOS_ID,
    FIRST_MERGE_ID,
    PAD_ID,
    SEP_ID,
    get_tokenizer,
)


@pytest.fixture(scope="module")
def tok():
    assert DEFAULT_MERGES_PATH.exists(), "run scripts/train_bpe.py"
    return BPETokenizer.load()


def test_roundtrip_arbitrary_text(tok):
    for text in (
        "The quick brown fox jumps over the lazy dog.",
        "# Heading\n\n- list item one\n- item two\n\n**bold** text",
        "unicode: café über naïve — em-dash… 你好",
        "CODE 48151 62342 10666",
        "",
        "   leading spaces\tand\ttabs\n\n",
    ):
        assert tok.decode(tok.encode(text)) == text


def test_compression_beats_bytes(tok):
    text = (
        "The compression encoder processes document pages into vision "
        "tokens and the decoder emits structured markdown output."
    )
    bpe_len = len(tok.encode(text))
    byte_len = len(ByteTokenizer().encode(text))
    assert bpe_len < byte_len / 2.5, (bpe_len, byte_len)


def test_specials_shared_with_byte_vocab(tok):
    assert tok.pad_id == PAD_ID and tok.eos_id == EOS_ID
    assert tok.sep_id == SEP_ID
    # No text token id collides with the specials range.
    for tid in tok.expansions():
        assert tid < 256 or tid >= FIRST_MERGE_ID
    assert tok.vocab_size % 128 == 0


def test_task_logit_mask_allows_merges(tok):
    from vision_compression_project_tpu.models.vlm import _task_logit_mask

    mask = _task_logit_mask(tok, "extract")
    assert mask.shape == (tok.vocab_size,)
    ids = tok.encode("Normal markdown text.")
    assert all(mask[i] == 0.0 for i in ids), "text tokens must be allowed"
    assert mask[SEP_ID] == 0.0 and mask[EOS_ID] == 0.0
    assert mask[PAD_ID] < -1e29  # specials like PAD stay banned
    answer_mask = _task_logit_mask(tok, "answer")
    assert answer_mask[SEP_ID] < -1e29


def test_get_tokenizer_selects_by_config():
    from vision_compression_project_tpu.models import get_preset

    assert get_tokenizer(get_preset("tiny")).cache_key == "byte"
    bpe = get_tokenizer(get_preset("ocr_bpe"))
    assert bpe.cache_key.startswith("bpe-")
    assert bpe.vocab_size == get_preset("ocr_bpe").decoder.vocab


@pytest.mark.slow
def test_runner_extracts_with_bpe_vocab():
    """Mechanics with the BPE model: valid 4-key records, decodable text."""
    from vision_compression_project_tpu.models import VLMRunner, get_preset

    cfg = get_preset("tiny")
    import dataclasses

    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, vocab=4096, tokenizer="bpe")
    )
    runner = VLMRunner(cfg, max_new_default=8)
    pages = np.full((2, 64, 64, 3), 255, np.uint8)
    records = runner.extract_batch(pages, page_numbers=[1, 2])
    assert len(records) == 2
    for r in records:
        assert set(r) == {"page_number", "markdown", "entities", "summary"}
        assert isinstance(r["markdown"], str)


def test_train_data_uses_config_tokenizer():
    from vision_compression_project_tpu.train.data import target_tokens

    tok = BPETokenizer.load()
    text = "Sample Title\nSome sentence about compression and indexes."
    bpe_t = target_tokens(text, 1, 256, tok=tok)
    byte_t = target_tokens(text, 1, 256)
    n_bpe = int((bpe_t != PAD_ID).sum())
    n_byte = int((byte_t != PAD_ID).sum())
    assert n_bpe < n_byte / 2


def test_get_tokenizer_accepts_kind_string():
    from vision_compression_project_tpu.models.tokenizer import (
        BPETokenizer,
        ByteTokenizer,
        get_tokenizer,
    )

    assert isinstance(get_tokenizer("byte"), ByteTokenizer)
    assert isinstance(get_tokenizer("bpe"), BPETokenizer)
    # a word from the synthetic corpus is a single merged token
    assert len(get_tokenizer("bpe").encode("model")) == 1

"""Byte-level tokenizer.

Deterministic, dependency-free, and hermetic: token ids 0..255 are raw UTF-8
bytes; specials follow.  A byte vocabulary makes constrained JSON emission
trivial (every JSON structural character is a single token) and keeps the
vocab dimension (512 after padding) MXU- and TP-friendly (divisible by 128
and by any model-axis shard count we use).

The reference had no tokenizer at all (models were cloud APIs); this is the
framework's equivalent of its prompt/response plumbing
(reference: backend/app/config.py:44-54).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

PAD_ID = 256
BOS_ID = 257
EOS_ID = 258
SEP_ID = 259          # separates conditioning segments (e.g. question | evidence)
TASK_EXTRACT_ID = 260  # page-image -> structured JSON fields
TASK_ANSWER_ID = 261   # evidence pack -> cited answer
TASK_EMBED_ID = 262    # text -> embedding
FIELD_MARKDOWN_ID = 263
FIELD_ENTITIES_ID = 264
FIELD_SUMMARY_ID = 265

VOCAB_SIZE = 512  # padded up for hardware-friendly embedding/unembedding shapes


class ByteTokenizer:
    """UTF-8 byte tokenizer with special tokens."""

    vocab_size = VOCAB_SIZE
    pad_id = PAD_ID
    bos_id = BOS_ID
    eos_id = EOS_ID
    sep_id = SEP_ID

    def encode(self, text: str, add_bos: bool = False, add_eos: bool = False) -> List[int]:
        ids = list(text.encode("utf-8"))
        if add_bos:
            ids = [BOS_ID] + ids
        if add_eos:
            ids = ids + [EOS_ID]
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        data = bytes(i for i in ids if 0 <= int(i) < 256)
        return data.decode("utf-8", errors="replace")

    def encode_batch(
        self, texts: Sequence[str], max_len: int, add_bos: bool = False
    ) -> tuple:
        """Pad/truncate to (B, max_len) int32 plus (B,) lengths.

        Truncation respects UTF-8 boundaries only trivially (byte cut); the
        decoder uses errors='replace' so round-trips stay safe.
        """
        batch = np.full((len(texts), max_len), PAD_ID, np.int32)
        lengths = np.zeros((len(texts),), np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t, add_bos=add_bos)[:max_len]
            batch[i, : len(ids)] = ids
            lengths[i] = len(ids)
        return batch, lengths

"""Byte-level and learned-BPE tokenizers.

Token ids 0..255 are raw UTF-8 bytes; specials follow at 256..265; BPE merge
tokens (when a merges file is loaded) start at 266.  Byte fallback is
structural: every text encodes, and every token decodes to bytes.

The byte vocabulary (512 padded) keeps tests hermetic and constrained JSON
emission trivial, but it is an architecture-level THROUGHPUT ceiling: a real
page's markdown is thousands of decode steps.  The BPE vocabulary (~4k,
scripts/train_bpe.py) brings that down to hundreds — decode cost per page
drops by the compression ratio (~3-4x on English markdown).

The reference had no tokenizer at all (models were cloud APIs); this is the
framework's equivalent of its prompt/response plumbing
(reference: backend/app/config.py:44-54).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

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

N_SPECIALS = 10        # ids 256..265
FIRST_MERGE_ID = 266   # BPE merge tokens start here
DEFAULT_MERGES_PATH = Path(__file__).parent / "bpe_merges.json"


class ByteTokenizer:
    """UTF-8 byte tokenizer with special tokens."""

    vocab_size = VOCAB_SIZE
    pad_id = PAD_ID
    bos_id = BOS_ID
    eos_id = EOS_ID
    sep_id = SEP_ID
    cache_key = "byte"

    def expansions(self) -> dict:
        """token id -> byte expansion (text tokens only; no specials)."""
        return {i: bytes([i]) for i in range(256)}

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


class BPETokenizer:
    """Byte-pair-encoding tokenizer with byte fallback and the same special
    tokens as ByteTokenizer (ids 256..265 are shared, so prompts, logit
    masks and field separators keep their meaning across tokenizers)."""

    pad_id = PAD_ID
    bos_id = BOS_ID
    eos_id = EOS_ID
    sep_id = SEP_ID

    # GPT-2-style pretokens: a word keeps its leading space; whitespace runs
    # and digit runs stay separate so merges never cross word boundaries.
    _WORD_RE = re.compile(rb" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")

    def __init__(self, merges: Sequence[Tuple[int, int]]):
        self.merges = [tuple(m) for m in merges]
        self._expand: Dict[int, bytes] = {i: bytes([i]) for i in range(256)}
        self._rank: Dict[Tuple[int, int], Tuple[int, int]] = {}
        for r, (a, b) in enumerate(self.merges):
            tid = FIRST_MERGE_ID + r
            self._expand[tid] = self._expand[a] + self._expand[b]
            self._rank[(a, b)] = (r, tid)
        raw = FIRST_MERGE_ID + len(self.merges)
        self.vocab_size = -(-raw // 128) * 128  # pad: MXU/TP-friendly
        self.cache_key = f"bpe-{len(self.merges)}"
        self._word_cache: Dict[bytes, Tuple[int, ...]] = {}

    # -- persistence ----------------------------------------------------------

    def save(self, path=None) -> Path:
        path = Path(path or DEFAULT_MERGES_PATH)
        path.write_text(json.dumps({"merges": self.merges}))
        return path

    @classmethod
    def load(cls, path=None) -> "BPETokenizer":
        path = Path(path or DEFAULT_MERGES_PATH)
        data = json.loads(path.read_text())
        return cls(data["merges"])

    # -- training ---------------------------------------------------------------

    @classmethod
    def train(
        cls,
        texts: Iterable[str],
        vocab_size: int = 4096,
        merge_digits: bool = False,
    ) -> "BPETokenizer":
        """Classic BPE with incremental pair counts + lazy-deletion heap.

        merge_digits=False (default) bans merges whose expansion is all
        ASCII digits: digit sequences in documents are CONTENT (codes,
        measurements, years) that OCR must read digit-by-digit from pixels;
        merged digit-pairs would turn that into arbitrary multi-digit
        classifications and measurably hurt extraction accuracy."""
        import heapq
        from collections import Counter, defaultdict

        word_counts: Counter = Counter()
        for t in texts:
            for m in cls._WORD_RE.finditer(t.encode("utf-8")):
                word_counts[m.group(0)] += 1
        words: Dict[bytes, List[int]] = {w: list(w) for w in word_counts}

        pair_counts: Counter = Counter()
        pair_words = defaultdict(set)
        for w, ids in words.items():
            c = word_counts[w]
            for p in zip(ids, ids[1:]):
                pair_counts[p] += c
                pair_words[p].add(w)
        heap = [(-c, p) for p, c in pair_counts.items()]
        heapq.heapify(heap)

        n_merges = max(0, vocab_size - FIRST_MERGE_ID)
        merges: List[Tuple[int, int]] = []
        expand: Dict[int, bytes] = {i: bytes([i]) for i in range(256)}
        next_id = FIRST_MERGE_ID
        while len(merges) < n_merges and heap:
            negc, pair = heapq.heappop(heap)
            if pair_counts.get(pair, 0) != -negc:  # stale heap entry
                continue
            if -negc < 2:
                break
            if not merge_digits:
                exp = expand.get(pair[0], b"") + expand.get(pair[1], b"")
                n_digits = sum(0x30 <= b <= 0x39 for b in exp)
                only_sp_digits = all(
                    0x30 <= b <= 0x39 or b == 0x20 for b in exp
                )
                if n_digits >= 2 and only_sp_digits:
                    pair_counts.pop(pair, None)  # banned: multi-digit merge
                    pair_words.pop(pair, None)
                    continue
            merges.append(pair)
            expand[next_id] = expand.get(pair[0], b"") + expand.get(pair[1], b"")
            a, b = pair
            touched: Counter = Counter()
            for w in list(pair_words.get(pair, ())):
                ids = words[w]
                c = word_counts[w]
                out: List[int] = []
                j = 0
                while j < len(ids):
                    if j + 1 < len(ids) and ids[j] == a and ids[j + 1] == b:
                        out.append(next_id)
                        j += 2
                    else:
                        out.append(ids[j])
                        j += 1
                for p in zip(ids, ids[1:]):
                    touched[p] -= c
                for p in zip(out, out[1:]):
                    touched[p] += c
                    pair_words[p].add(w)
                words[w] = out
            del pair_counts[pair]
            pair_words.pop(pair, None)
            for p, dc in touched.items():
                if dc == 0 or p == pair:
                    continue
                pair_counts[p] = pair_counts.get(p, 0) + dc
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                else:
                    heapq.heappush(heap, (-pair_counts[p], p))
            next_id += 1
        return cls(merges)

    # -- encode / decode --------------------------------------------------------

    def _encode_word(self, wb: bytes) -> Tuple[int, ...]:
        cached = self._word_cache.get(wb)
        if cached is not None:
            return cached
        parts = list(wb)
        while len(parts) >= 2:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                rk = self._rank.get((parts[i], parts[i + 1]))
                if rk is not None and (best_rank is None or rk[0] < best_rank[0]):
                    best_rank = rk
                    best_i = i
            if best_rank is None:
                break
            a, b = parts[best_i], parts[best_i + 1]
            tid = best_rank[1]
            out: List[int] = []
            j = 0
            while j < len(parts):
                if j + 1 < len(parts) and parts[j] == a and parts[j + 1] == b:
                    out.append(tid)
                    j += 2
                else:
                    out.append(parts[j])
                    j += 1
            parts = out
        result = tuple(parts)
        if len(self._word_cache) < 65536:
            self._word_cache[wb] = result
        return result

    def encode(self, text: str, add_bos: bool = False, add_eos: bool = False) -> List[int]:
        ids: List[int] = []
        for m in self._WORD_RE.finditer(text.encode("utf-8")):
            ids.extend(self._encode_word(m.group(0)))
        if add_bos:
            ids = [BOS_ID] + ids
        if add_eos:
            ids = ids + [EOS_ID]
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        chunks = []
        for i in ids:
            exp = self._expand.get(int(i))
            if exp is not None:
                chunks.append(exp)
        return b"".join(chunks).decode("utf-8", errors="replace")

    def encode_batch(
        self, texts: Sequence[str], max_len: int, add_bos: bool = False
    ) -> tuple:
        batch = np.full((len(texts), max_len), PAD_ID, np.int32)
        lengths = np.zeros((len(texts),), np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t, add_bos=add_bos)[:max_len]
            batch[i, : len(ids)] = ids
            lengths[i] = len(ids)
        return batch, lengths

    def expansions(self) -> Dict[int, bytes]:
        """token id -> byte expansion (text tokens only; no specials)."""
        return dict(self._expand)


def get_tokenizer(cfg=None, merges_path=None):
    """Tokenizer for a model config: DecoderConfig.tokenizer selects 'byte'
    (hermetic default) or 'bpe' (loads the committed merges file); vocab
    sizes are validated against the config so embeddings always match."""
    if isinstance(cfg, str):  # accept "byte"/"bpe" directly
        kind = cfg
    else:
        kind = (
            getattr(getattr(cfg, "decoder", cfg), "tokenizer", "byte")
            if cfg
            else "byte"
        )
    if kind == "byte":
        return ByteTokenizer()
    if kind.startswith("bpe"):
        # "bpe" loads the default merges; "bpe:<file>.json" loads a named
        # merges file from the models/ directory, so presets trained on
        # different corpora (e.g. real-language vs synthetic) can coexist
        # without invalidating each other's shipped checkpoints.
        if merges_path is None and ":" in kind:
            merges_path = Path(__file__).parent / kind.split(":", 1)[1]
        tok = BPETokenizer.load(merges_path)
        want = getattr(getattr(cfg, "decoder", cfg), "vocab", tok.vocab_size)
        if tok.vocab_size != want:
            raise ValueError(
                f"BPE vocab {tok.vocab_size} != model vocab {want}; retrain "
                "merges (scripts/train_bpe.py) or fix the preset"
            )
        return tok
    raise ValueError(f"unknown tokenizer kind {kind!r}")

"""Synthetic supervised data for VLM pretraining.

The reference never trains (its model was a cloud API); this generator
closes the loop for the on-device VLM: synthetic document pages are written
as real PDFs (raster/pdfgen.py), rasterized by the C++ engine — the exact
input distribution the serving path sees — and paired with the target token
sequence the decoder is supposed to emit
(`markdown <SEP> summary <SEP> entities <EOS>`, models/vlm.py) derived from
the known source text via the same deterministic structurer the text engine
uses (pipeline/textmd.py).  Training on this teaches the model the
raster->structured-markdown mapping (synthetic-font OCR); fine-tuning on
real scanned corpora slots into the same iterator interface.
"""

from __future__ import annotations

import re
import tempfile
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..models.configs import VLMConfig
from ..models.tokenizer import (
    BOS_ID,
    ByteTokenizer,
    EOS_ID,
    PAD_ID,
    SEP_ID,
    TASK_EXTRACT_ID,
    get_tokenizer,
)
from ..models.vlm import UNIT_SEP
from ..pipeline.textmd import structure_page

_WORDS = (
    "model data page table figure result method train loss token image "
    "system value metric test index query answer document vision text "
    "compression encoder decoder attention kernel batch memory device"
).split()


def synthetic_code_page(
    rng: np.random.Generator, lines: int = 8, groups: int = 3, digits: int = 5
) -> str:
    """Pages of random digit codes: unpredictable from language statistics,
    so any loss below the ln(10)/digit blind floor must come from *reading
    the pixels* — the cleanest probe that vision conditioning works."""
    title = "Code Sheet " + str(int(rng.integers(100, 999)))
    body = []
    for _ in range(lines):
        gs = " ".join(
            "".join(str(d) for d in rng.integers(0, 10, size=digits))
            for _ in range(groups)
        )
        body.append("CODE " + gs)
    return title + "\n" + "\n".join(body)


def synthetic_page_text(
    rng: np.random.Generator,
    lines: int = 18,
    min_words: int = 5,
    max_words: int = 10,
    title_words: int = 3,
) -> str:
    title = " ".join(rng.choice(_WORDS, size=title_words)).title()
    body = []
    for _ in range(lines):
        n = int(rng.integers(min_words, max_words + 1))
        sentence = " ".join(rng.choice(_WORDS, size=n)) + "."
        body.append(sentence.capitalize())
    return title + "\n" + "\n".join(body)


def target_tokens(text: str, page_number: int, max_len: int, tok=None) -> np.ndarray:
    """Teacher sequence: BOS TASK markdown SEP summary SEP entities EOS."""
    tok = tok or ByteTokenizer()
    record = structure_page(text, page_number)
    ids: List[int] = [BOS_ID, TASK_EXTRACT_ID]
    ids += tok.encode(record["markdown"])
    ids.append(SEP_ID)
    ids += tok.encode(record["summary"])
    ids.append(SEP_ID)
    for i, entity in enumerate(record["entities"]):
        if i:
            ids.append(UNIT_SEP)
        ids += tok.encode(entity)
    ids.append(EOS_ID)
    out = np.full((max_len,), PAD_ID, np.int32)
    ids = ids[: max_len - 1] + [EOS_ID] if len(ids) > max_len else ids
    out[: len(ids)] = ids
    return out


def synthetic_batches(
    cfg: VLMConfig,
    batch_size: int,
    text_len: int = 512,
    dpi: int = 72,
    seed: int = 0,
    workdir: Optional[Path] = None,
    font_size: int = 12,
    lines: int = 18,
    kind: str = "words",
    code_groups: int = 3,
    code_digits: int = 5,
    jumble_frac: float = 0.0,
    fonts: Optional[List[str]] = None,
    vocab_cap: int = 0,
    jumble_plain: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields {"pages_u8": (B,H,W,3), "token_ids": (B,text_len)} forever.

    fonts: font specs to rotate per page (pdfgen aliases/paths or
    "builtin").  Real/jumble page text is wrapped with the chosen font's own
    metrics so nothing clips; other kinds keep builtin-width text but still
    render in the rotated font (their short sentences fit any of them)."""
    from ..raster import PdfDocument, make_pdf

    rng = np.random.default_rng(seed)
    workdir = Path(workdir or tempfile.mkdtemp(prefix="vcp_train_"))
    tok = get_tokenizer(cfg)
    text_len = min(text_len, cfg.decoder.max_seq - cfg.vision.tokens_out - 1)
    step = 0
    import functools as _ft

    if kind == "codes":
        gen = _ft.partial(
            synthetic_code_page, groups=code_groups, digits=code_digits
        )
    elif kind == "codes_easy":
        gen = _ft.partial(synthetic_code_page, groups=1, digits=5)
    elif kind == "words_easy":
        # Short sentences (2-3 words) that stay inside the page width at
        # large font sizes — the letter-glyph acquisition curriculum stage
        # (pdfgen does not wrap lines; clipped words would poison targets).
        gen = _ft.partial(
            synthetic_page_text, min_words=2, max_words=3, title_words=2
        )
    elif kind == "real":
        # Real-language prose (open vocabulary), width-wrapped for the
        # render font — the round-3 curriculum that replaces the 28-word
        # closed vocabulary (VERDICT r2 item 1).
        from .corpus import real_page_text

        gen = _ft.partial(real_page_text, font_size=font_size)
    elif kind == "jumble":
        # Independently random corpus words: unmemorizable, so loss can
        # only drop by reading the pixels (see corpus.jumble_page_text).
        # vocab_cap ramps the word inventory (small caps concentrate the
        # reading gradient for the vision dive).
        from .corpus import jumble_page_text

        gen = _ft.partial(
            jumble_page_text, font_size=font_size, vocab_cap=vocab_cap,
            plain=jumble_plain,
        )
    else:
        gen = synthetic_page_text
    mix_gen = None
    if jumble_frac > 0.0 and kind != "jumble":
        from .corpus import jumble_page_text

        mix_gen = _ft.partial(
            jumble_page_text, font_size=font_size, vocab_cap=vocab_cap,
            plain=jumble_plain,
        )
    fonts = list(fonts or ["builtin"])
    while True:
        page_fonts = [int(rng.integers(0, len(fonts))) for _ in range(batch_size)]
        texts = []
        for i in range(batch_size):
            g = mix_gen if mix_gen and rng.random() < jumble_frac else gen
            takes_font = g is mix_gen or kind in ("real", "jumble")
            kwargs = {"font": fonts[page_fonts[i]]} if takes_font else {}
            texts.append(g(rng, lines=lines, **kwargs))
        pdf = make_pdf(
            texts, workdir / f"batch_{step % 4}.pdf", font_size=font_size,
            fonts=fonts, page_fonts=page_fonts,
        )
        with PdfDocument(pdf) as doc:
            rasters = doc.render_batch(0, batch_size - 1, dpi=dpi)
        h = max(r.shape[0] for r in rasters)
        w = max(r.shape[1] for r in rasters)
        pages = np.full((batch_size, h, w, 3), 255, np.uint8)
        for i, r in enumerate(rasters):
            pages[i, : r.shape[0], : r.shape[1]] = r
        tokens = np.stack(
            [target_tokens(t, i + 1, text_len, tok=tok) for i, t in enumerate(texts)]
        )
        yield {"pages_u8": pages, "token_ids": tokens}
        step += 1


def prefetch_batches(
    it: Iterator[Dict[str, np.ndarray]], depth: int = 2
) -> Iterator[Dict[str, np.ndarray]]:
    """Run a host-bound batch generator in a background thread.

    Synthetic-page batches are produced by CPU work (PDF synthesis + C++
    rasterization + tokenization) that otherwise serializes with the device
    train step; a depth-bounded queue overlaps the two so the accelerator
    never waits on page rendering (the reference's analogue was its
    thread-pooled per-page fan-out, reference backend/app/pipeline/
    pdf_extract.py:328)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(sentinel)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True, name="batch-prefetch").start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def device_batch(runner_or_cfg, batch: Dict[str, np.ndarray]) -> Dict:
    """Host batch -> device train-step batch (patch tokens + token ids)."""
    import jax.numpy as jnp

    from ..ops.preprocess import preprocess_pages

    cfg = getattr(runner_or_cfg, "cfg", runner_or_cfg)
    vision = cfg.vision
    pages = batch["pages_u8"]
    if pages.ndim == 4 and pages.shape[-1] == 3:
        # Synthetic pages raster grayscale: ship one channel (3x less
        # host->device traffic; broadcast after the on-device resize).
        pages = pages[..., 0]
    patches = preprocess_pages(
        jnp.asarray(pages),
        target_h=vision.image_size,
        target_w=vision.image_size,
        patch=vision.patch,
    )
    token_ids = batch["token_ids"]
    # Uniform batch structure: tasks without an explicit supervision span
    # (extraction) supervise every non-pad target token.
    loss_mask = batch.get("loss_mask")
    if loss_mask is None:
        loss_mask = np.ones_like(token_ids)
    return {
        "patch_tokens": patches,
        "token_ids": jnp.asarray(token_ids),
        "loss_mask": jnp.asarray(loss_mask),
    }


# ---------------------------------------------------------------------------
# Answer-task supervision (question + evidence pack -> cited answer)
# ---------------------------------------------------------------------------


def qa_sentence_pool(split: str = "train", max_chars: int = 120) -> List[str]:
    """Real-language sentences short enough for evidence packs (the full
    corpus allows 220-char sentences; 3-5 pages of those would blow the
    answer-task token budget before the target sentence even appears)."""
    from .corpus import corpus_sentences

    return [s for s in corpus_sentences(split) if len(s) <= max_chars]


def _qa_page_sentences(
    rng: np.random.Generator, n: int, sentence_pool: Optional[List[str]]
) -> List[str]:
    """n evidence sentences: CONSECUTIVE real-corpus prose when a pool is
    given (reads like an actual document page, the distribution /chat sees
    at serve time — VERDICT r2 item 4 measured the synthetic-only model
    degrading on exactly this), else the legacy word-soup generator."""
    if sentence_pool:
        start = int(rng.integers(0, len(sentence_pool)))
        return [sentence_pool[(start + i) % len(sentence_pool)] for i in range(n)]
    out = []
    for _ in range(n):
        k = int(rng.integers(5, 10))
        out.append((" ".join(rng.choice(_WORDS, size=k)) + ".").capitalize())
    return out


def _synthetic_qa_example(
    rng: np.random.Generator,
    doc_id: str = "doc",
    sentence_pool: Optional[List[str]] = None,
):
    """One (question, evidence_pack, answer_md) triple.

    Pages are synthetic or real-corpus sentences (sentence_pool); the
    question targets one specific sentence's content words; the teacher
    answer is the citation format the extractive engine emits
    (pipeline/qa.py:_compose_extractive_answer) with the target sentence as
    the claim — so the LM learns the full serve-time contract: select the
    relevant evidence sentence, quote it, cite its page, in markdown."""
    n_pages = int(rng.integers(2, 5))
    pages = []
    for _ in range(n_pages):
        n_sent = int(rng.integers(2, 5))
        pages.append(_qa_page_sentences(rng, n_sent, sentence_pool))
    tp = int(rng.integers(0, n_pages))         # target page index
    ts = int(rng.integers(0, len(pages[tp])))  # target sentence index
    target = pages[tp][ts]
    content_words = [
        w for w in re.findall(r"[a-z]+", target.lower()) if len(w) > 3
    ][:4]
    question = "What about " + " ".join(content_words) + "?"
    page_numbers = list(range(1, n_pages + 1))
    parts = []
    for pno, sents in zip(page_numbers, pages):
        parts.append(f"[Page {pno} | memory_id=m{pno:02d}]\n" + " ".join(sents))
    evidence_pack = "\n\n---\n\n".join(parts)
    answer_md = (
        f"Based on the retrieved pages ({doc_id} p.{page_numbers[tp]}):\n\n"
        f"- {target} ({doc_id} p.{page_numbers[tp]})"
    )
    return question, evidence_pack, answer_md


_AGG_SUBJECTS = ("region", "team", "sensor", "cluster", "plant")
_AGG_NAMES = (
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "sigma",
)
_AGG_ITEMS = ("units", "samples", "reports", "devices", "queries", "errors")


def _synthetic_agg_qa_example(
    rng: np.random.Generator,
    doc_id: str = "doc",
    sentence_pool: Optional[List[str]] = None,
):
    """One AGGREGATION QA example: (question, evidence_pack, answer_md,
    facts).  The answer is a count / total / superlative over facts spread
    across pages — a statement that appears in NO evidence sentence, so the
    extractive engine (which can only quote sentences) cannot produce it;
    this is what generative synthesis adds over extraction (the reference
    got it from the Gemini pass, reference backend/app/pipeline/qa.py:
    189-217).  `facts` carries the programmatic ground truth
    (scripts/eval_answer.py --task agg scores key-fact accuracy with it)."""
    kind = str(rng.choice(["count", "sum", "max"]))
    n_pages = int(rng.integers(3, 6))
    subject = str(rng.choice(_AGG_SUBJECTS))
    item = str(rng.choice(_AGG_ITEMS))
    names = list(rng.choice(_AGG_NAMES, size=n_pages, replace=False))
    values = rng.integers(2, 98, size=n_pages)
    if kind == "max":
        # Unique maximum, or "which produced the most" has no single answer.
        j = int(rng.integers(0, n_pages))
        values[j] = int(values.max()) + int(rng.integers(1, 10))
    if sentence_pool:
        # Topic word drawn from real prose so the mention sentence and the
        # question share the corpus vocabulary, not the 28-word soup.
        cand = re.findall(
            r"[a-z]{5,}", sentence_pool[int(rng.integers(0, len(sentence_pool)))].lower()
        )
        topic = cand[int(rng.integers(0, len(cand)))] if cand else str(rng.choice(_WORDS))
    else:
        topic = str(rng.choice(_WORDS))
    mention = rng.random(n_pages) < 0.5
    if kind == "count":
        while not 0 < mention.sum():  # at least one page must mention it
            mention = rng.random(n_pages) < 0.5

    pages = []
    for i in range(n_pages):
        sents = [
            f"{subject.capitalize()} {names[i]} produced "
            f"{int(values[i])} {item}."
        ]
        if mention[i]:
            sents.append(f"The {topic} module is covered in this section.")
        n_fill = int(rng.integers(1, 3))
        sents += _qa_page_sentences(rng, n_fill, sentence_pool)
        rng.shuffle(sents)
        pages.append(" ".join(sents))

    page_numbers = list(range(1, n_pages + 1))
    parts = [
        f"[Page {p} | memory_id=m{p:02d}]\n{text}"
        for p, text in zip(page_numbers, pages)
    ]
    evidence_pack = "\n\n---\n\n".join(parts)

    if kind == "count":
        cited = [p for p, m in zip(page_numbers, mention) if m]
        question = f"How many pages mention the {topic} module?"
        claim = (
            f"{len(cited)} of the {n_pages} pages mention the {topic} module"
        )
        facts = {"kind": kind, "value": len(cited), "cited": cited}
    elif kind == "sum":
        cited = page_numbers
        total = int(values.sum())
        question = (
            f"How many {item} were produced in total across all {subject}s?"
        )
        claim = f"The {subject}s produced {total} {item} in total"
        facts = {"kind": kind, "value": total, "cited": cited}
    else:  # max
        j = int(np.argmax(values))
        cited = [page_numbers[j]]
        question = f"Which {subject} produced the most {item}?"
        claim = (
            f"{subject.capitalize()} {names[j]} produced the most {item} "
            f"({int(values[j])})"
        )
        facts = {
            "kind": kind, "value": int(values[j]), "name": names[j],
            "cited": cited,
        }
    cite_str = ", ".join(f"p.{p}" for p in cited)
    answer_md = (
        f"Based on the retrieved pages ({doc_id} {cite_str}):\n\n"
        f"- {claim} ({doc_id} {cite_str})"
    )
    return question, evidence_pack, answer_md, facts


def qa_batches(
    cfg: VLMConfig,
    batch_size: int,
    text_len: int = 512,
    seed: int = 0,
    agg_frac: float = 0.0,
    data_kind: str = "words",
) -> Iterator[Dict[str, np.ndarray]]:
    """Text-only answer-task batches shaped for the SAME train step as page
    extraction (blank pages ride the vision tower so one checkpoint serves
    both tasks): {"pages_u8": blank (B,h,w,3), "token_ids": (B,text_len)}.

    token_ids = BOS TASK_ANSWER question SEP evidence SEP answer EOS —
    matching VLMRunner.answer's prompt layout so generation continues
    exactly where the training prompt ends.

    agg_frac: fraction of examples drawn from the AGGREGATION generator
    (counts/totals/superlatives across pages, _synthetic_agg_qa_example) —
    supervision the extractive engine cannot imitate.

    data_kind: 'words' = legacy soup sentences; 'real' = real-corpus
    evidence prose (qa_sentence_pool); 'mixed' = 50/50 per example.  Real
    evidence is what /chat actually sees at serve time — the synthetic-only
    model was MEASURED to ignore real-language evidence (round-3 status)."""
    from ..models.tokenizer import TASK_ANSWER_ID

    rng = np.random.default_rng(seed)
    tok = get_tokenizer(cfg)
    text_len = min(text_len, cfg.decoder.max_seq - cfg.vision.tokens_out - 1)
    pool = qa_sentence_pool("train") if data_kind in ("real", "mixed") else None
    blank = np.full((batch_size, 64, 64, 3), 255, np.uint8)
    while True:
        tokens = np.full((batch_size, text_len), PAD_ID, np.int32)
        # Supervise ONLY the answer span (after the evidence SEP): the
        # prompt (question + evidence) is given at serve time, and CE over
        # it drowns the answer-format gradient ~10:1 otherwise.
        loss_mask = np.zeros((batch_size, text_len), np.int32)
        for i in range(batch_size):
            use_pool = pool if (
                data_kind == "real"
                or (data_kind == "mixed" and rng.random() < 0.5)
            ) else None
            # Resample when the evidence overflows its token budget: plain
            # truncation could cut the TARGET sentence out of the pack,
            # supervising the model to answer from missing evidence (real
            # corpus sentences are 5-20x longer than the soup ones).
            for _attempt in range(6):
                if rng.random() < agg_frac:
                    q, ev, ans, _ = _synthetic_agg_qa_example(
                        rng, sentence_pool=use_pool
                    )
                else:
                    q, ev, ans = _synthetic_qa_example(
                        rng, sentence_pool=use_pool
                    )
                ids: List[int] = [BOS_ID, TASK_ANSWER_ID]
                ids += tok.encode(q)
                ids.append(SEP_ID)
                ev_ids = tok.encode(ev)
                ans_ids = tok.encode(ans) + [EOS_ID]
                budget = text_len - len(ids) - len(ans_ids) - 1
                if len(ev_ids) <= budget:
                    break
            ids += ev_ids[: max(0, budget)]
            ids.append(SEP_ID)
            answer_start = len(ids)  # first answer token index
            ids += ans_ids
            ids = ids[: text_len - 1] + [EOS_ID] if len(ids) > text_len else ids
            tokens[i, : len(ids)] = ids
            loss_mask[i, answer_start : len(ids)] = 1
        yield {"pages_u8": blank, "token_ids": tokens, "loss_mask": loss_mask}

"""The flagship model: vision encoder + projector + LM decoder, with a
jitted batched greedy-generation runner.

On-device replacement for the reference's per-page Gemini-Vision calls
(reference: backend/app/pipeline/pdf_extract.py:146-166) and answer
generation (reference: backend/app/pipeline/qa.py:189-217).  Pages are
processed as device batches (the reference's 5-thread fan-out becomes the
batch dimension); generation is a lax.while-free fori_loop over decode steps
with a carried KV cache, fully inside one jit.

Structured output: the decoder emits `markdown <SEP> summary <SEP> entity
(<US> entity)* <EOS>`; the host assembles the exact
{page_number, markdown, entities, summary} page JSON, so artifacts are valid
JSON by construction (the reference fence-stripped free-form model text,
utils.py:34-53 — that parser is retained for reading legacy artifacts only).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .configs import VLMConfig
from .decoder import Decoder
from .layers import _dtype, dense_init
from .tokenizer import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    SEP_ID,
    TASK_ANSWER_ID,
    TASK_EXTRACT_ID,
    get_tokenizer,
)
from .vit import VisionEncoder

UNIT_SEP = 0x1F  # byte separating entity list items inside the entities field

# Evidence-vs-decode split for answer(): trained answers (train/data.py::
# qa_batches) fit in ~256 tokens and end with EOS, so evidence packing
# reserves this much; a larger requested max_new then extends the decode
# BOUND into whatever context remains after the real prompt (EOS exits
# early), instead of starving the evidence.
ANSWER_DECODE_RESERVE = 256


_MASK_CACHE: Dict[Tuple[str, str], np.ndarray] = {}


def _task_logit_mask(tok, kind: str):
    """Additive (vocab,) mask constraining emission to the output grammar
    (the token-level constrained-decoding half of structured output;
    host-side JSON assembly guarantees the rest).

    Text tokens are allowed when their byte expansion contains only
    printable/whitespace bytes — so the same rule covers the byte vocab and
    any BPE vocab.  'extract' additionally allows SEP (field separator), US
    (entity separator) and EOS; 'answer' allows EOS only."""
    key = (tok.cache_key, kind)
    cached = _MASK_CACHE.get(key)
    if cached is not None:
        return cached
    allowed_bytes = (
        set(range(0x20, 0x7F)) | set(range(0x80, 0x100)) | {0x09, 0x0A}
    )
    mask = np.full((tok.vocab_size,), -1e30, np.float32)
    for tid, exp in tok.expansions().items():
        if exp and all(b in allowed_bytes for b in exp):
            mask[tid] = 0.0
    if kind == "extract":
        mask[np.asarray([SEP_ID, EOS_ID, UNIT_SEP])] = 0.0
    elif kind == "answer":
        mask[EOS_ID] = 0.0
    else:
        raise ValueError(kind)
    _MASK_CACHE[key] = mask
    return mask


class OpticalVLM(nn.Module):
    cfg: VLMConfig

    def setup(self):
        self.vision = VisionEncoder(self.cfg.vision)
        self.proj = nn.Dense(
            self.cfg.decoder.dim,
            use_bias=False,
            dtype=_dtype(self.cfg.decoder.dtype),
            kernel_init=dense_init("vit_embed", "embed"),
        )
        self.decoder = Decoder(self.cfg.decoder)

    def encode_pages(self, patch_tokens: jnp.ndarray) -> jnp.ndarray:
        return self.proj(self.vision(patch_tokens))

    def __call__(
        self,
        patch_tokens: jnp.ndarray,
        token_ids: jnp.ndarray,
        kv_len: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Training/eval forward: logits over [vision ; text] sequence."""
        vis = self.encode_pages(patch_tokens)
        txt = self.decoder.embed_tokens(token_ids)
        x = jnp.concatenate([vis, txt.astype(vis.dtype)], axis=1)
        total_len = None
        if kv_len is not None:
            total_len = kv_len + vis.shape[1]
        return self.decoder(x, kv_len=total_len)

    def prefill_mixed(
        self,
        vision_emb: Optional[jnp.ndarray],
        prompt_ids: jnp.ndarray,
        kv_len: jnp.ndarray,
        cache_len: Optional[int] = None,
    ):
        txt = self.decoder.embed_tokens(prompt_ids)
        if vision_emb is not None:
            x = jnp.concatenate([vision_emb, txt.astype(vision_emb.dtype)], axis=1)
        else:
            x = txt
        return self.decoder.prefill(x, kv_len=kv_len, cache_len=cache_len)

    def decode_ids(self, ids: jnp.ndarray, caches, pos):
        x = self.decoder.embed_tokens(ids[:, None])
        return self.decoder.decode_step(x, caches, pos)


# ---------------------------------------------------------------------------
# Host-side runner
# ---------------------------------------------------------------------------


class VLMRunner:
    """Owns params and compiled functions; presents batched extract/answer.

    Weights default to deterministic random init (seed-stable): the framework
    is the serving/training machinery, checkpoints provide quality.  Trained
    weights load via train/checkpoint.py into the same pytree.
    """

    def __init__(
        self,
        cfg: VLMConfig,
        params: Optional[Any] = None,
        seed: int = 0,
        max_new_default: int = 256,
        mesh=None,
    ):
        self.cfg = cfg
        self.model = OpticalVLM(cfg)
        self.tok = get_tokenizer(cfg)
        self.max_new_default = max_new_default
        self.mesh = mesh
        if params is None:
            patch_dim = cfg.vision.patch * cfg.vision.patch * 3
            grid = cfg.vision.grid
            dummy_pages = jnp.zeros((1, grid * grid, patch_dim), jnp.bfloat16)
            dummy_ids = jnp.zeros((1, 8), jnp.int32)
            boxed = self.model.init(
                jax.random.PRNGKey(seed), dummy_pages, dummy_ids
            )["params"]
            if mesh is not None:
                # Multi-chip serving: TP/EP-shard params per their logical
                # axes (parallel/sharding.py); page batches ride the data
                # axis via _shard_batch.  Same code path, DP x TP scaling.
                from ..parallel.sharding import shard_params

                params = shard_params(boxed, mesh)
            else:
                params = nn.meta.unbox(boxed)
        self.params = params

    def _shard_batch(self, x):
        """Lay a batch-leading array over the mesh data axis (no-op without
        a mesh; batch must divide the data-axis size)."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import AXIS_DATA

        spec = P(AXIS_DATA, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, spec))

    # -- compiled pieces ----------------------------------------------------

    @functools.cached_property
    def _encode(self):
        @jax.jit
        def run(params, patch_tokens):
            return self.model.apply(
                {"params": params}, patch_tokens, method=OpticalVLM.encode_pages
            )

        return run

    @functools.cached_property
    def _generate(self):
        @functools.partial(
            jax.jit,
            static_argnames=("max_new", "has_vision", "cache_len", "lockstep"),
        )
        def run(
            params, vision_emb, prompt_ids, prompt_len, logit_mask,
            max_new, has_vision, cache_len, lockstep,
        ):
            b = prompt_ids.shape[0]
            vis_len = vision_emb.shape[1] if has_vision else 0
            kv_len_b = jnp.broadcast_to(prompt_len, (b,)) + vis_len

            def apply(method, *args):
                return self.model.apply({"params": params}, *args, method=method)

            logits, caches = apply(
                OpticalVLM.prefill_mixed,
                vision_emb if has_vision else None,
                prompt_ids,
                kv_len_b,
                cache_len,
            )
            # Next token comes from the position of the last real prompt token.
            last = jnp.take_along_axis(
                logits, (kv_len_b - 1)[:, None, None], axis=1
            )[:, 0] + logit_mask[None, :]
            first_tok = jnp.argmax(last, axis=-1).astype(jnp.int32)

            out0 = jnp.full((b, max_new), PAD_ID, jnp.int32)
            done0 = first_tok == EOS_ID
            out0 = out0.at[:, 0].set(jnp.where(done0, EOS_ID, first_tok))
            # Lockstep batches (uniform prompt length — the serving batcher
            # pads to one bucket) carry a scalar position: decode then updates
            # the donated cache in place via dynamic_update_slice.
            pos0 = (
                (prompt_len + vis_len).astype(jnp.int32).reshape(())
                if lockstep
                else kv_len_b
            )

            # while_loop with an all-done early exit: a batch stops decoding
            # when every row has emitted EOS, so decode cost tracks ACTUAL
            # output lengths, not the max_new cap (EOS-terminated decode —
            # the honest-bench requirement and a real serving win).
            def cond(carry):
                i, out, caches, last_tok, done, pos = carry
                return jnp.logical_and(
                    i < max_new, jnp.logical_not(jnp.all(done))
                )

            def body(carry):
                i, out, caches, last_tok, done, pos = carry
                logits_i, caches = apply(
                    OpticalVLM.decode_ids, last_tok, caches, pos
                )
                tok = jnp.argmax(
                    logits_i + logit_mask[None, :], axis=-1
                ).astype(jnp.int32)
                tok = jnp.where(done, PAD_ID, tok)
                out = out.at[:, i].set(tok)
                done = jnp.logical_or(done, tok == EOS_ID)
                return i + 1, out, caches, tok, done, pos + 1

            _, out, *_ = jax.lax.while_loop(
                cond, body, (jnp.asarray(1), out0, caches, first_tok, done0, pos0)
            )
            return out

        return run

    # -- public API ---------------------------------------------------------

    def preprocess_patches(self, pages_u8: np.ndarray) -> jnp.ndarray:
        from ..ops.preprocess import preprocess_pages

        cfg = self.cfg.vision
        return preprocess_pages(
            self._shard_batch(pages_u8),
            target_h=cfg.image_size,
            target_w=cfg.image_size,
            patch=cfg.patch,
        )

    def _start_generate(
        self,
        prompts: List[List[int]],
        vision_emb: Optional[jnp.ndarray],
        max_new: int,
        task: str = "extract",
    ) -> jnp.ndarray:
        """Dispatch generation; returns the device token array WITHOUT
        blocking (JAX async dispatch), so callers can pipeline the next
        batch's host->device transfer under this batch's compute."""
        b = len(prompts)
        plen = max(len(p) for p in prompts)
        # Pad prompt length to a lane-friendly bucket to bound recompiles.
        plen = max(8, -(-plen // 64) * 64)
        ids = np.full((b, plen), PAD_ID, np.int32)
        lens = np.zeros((b,), np.int32)
        for i, p in enumerate(prompts):
            p = p[:plen]
            ids[i, : len(p)] = p
            lens[i] = len(p)
        has_vision = vision_emb is not None
        vis_len = vision_emb.shape[1] if has_vision else 0
        if not has_vision:
            dim = self.cfg.decoder.dim
            vision_emb = jnp.zeros((b, 0, dim), _dtype(self.cfg.decoder.dtype))
        # The decode position must stay inside the model context: past
        # max_seq the dynamic_update_slice cache write clamps and silently
        # corrupts the last KV slot, so a too-large budget is truncated,
        # never allowed to wrap.
        max_new = max(1, min(max_new, self.cfg.decoder.max_seq - vis_len - plen))
        # Right-size the KV cache to this generation (128-aligned), bounded
        # by the model context; decode cost scales with this, not max_seq.
        cache_len = min(
            self.cfg.decoder.max_seq,
            -(-(vis_len + plen + max_new) // 128) * 128,
        )
        lockstep = all(int(l) == int(lens[0]) for l in lens)
        prompt_len = (
            jnp.asarray(int(lens[0]), jnp.int32) if lockstep else jnp.asarray(lens)
        )
        return self._generate(
            self.params,
            vision_emb,
            jnp.asarray(ids),
            prompt_len,
            jnp.asarray(_task_logit_mask(self.tok, task)),
            max_new,
            has_vision,
            cache_len,
            lockstep,
        )

    @staticmethod
    def _collect_tokens(toks: jnp.ndarray) -> List[List[int]]:
        """Block on the device token array and trim PAD/EOS."""
        toks = np.asarray(toks)
        result = []
        for row in toks:
            row = row.tolist()
            if EOS_ID in row:
                row = row[: row.index(EOS_ID)]
            result.append([t for t in row if t != PAD_ID])
        return result

    def _run_generate(
        self,
        prompts: List[List[int]],
        vision_emb: Optional[jnp.ndarray],
        max_new: int,
        task: str = "extract",
    ) -> List[List[int]]:
        return self._collect_tokens(
            self._start_generate(prompts, vision_emb, max_new, task=task)
        )

    def extract_batch_async(
        self, pages_u8: np.ndarray, page_numbers: List[int],
        max_new: Optional[int] = None,
    ):
        """Dispatch the full extract chain for one batch; returns an opaque
        handle for `collect_extract`.  Nothing blocks: H2D, preprocess,
        encode and the whole decode loop queue behind in-flight work, so
        batch i+1's transfer overlaps batch i's compute."""
        max_new = max_new or self.max_new_default
        patches = self.preprocess_patches(pages_u8)
        vis = self._encode(self.params, patches)
        # Prompts follow the (possibly padded) device batch; collect_extract
        # trims to page_numbers, so ragged chunks can ship padded.
        prompts = [[BOS_ID, TASK_EXTRACT_ID]] * int(pages_u8.shape[0])
        toks = self._start_generate(prompts, vis, max_new)
        return (toks, list(page_numbers))

    def extract_batch_async_glyphs(
        self,
        primitives,
        render_hw,
        page_numbers: List[int],
        max_new: Optional[int] = None,
    ):
        """Glyph-transport variant: pages arrive as drawable primitives
        (~KB/page) and the raster is produced ON DEVICE
        (ops/glyph_render.py), eliminating pixel host->device transfers."""
        from ..ops.glyph_render import pack_primitives, render_pages_from_glyphs

        max_new = max_new or self.max_new_default
        h, w = render_hw
        glyphs, n_glyphs, rects, n_rects = pack_primitives(primitives)
        pages_gray = render_pages_from_glyphs(
            jnp.asarray(glyphs), jnp.asarray(n_glyphs),
            jnp.asarray(rects), jnp.asarray(n_rects), h=h, w=w,
        )
        patches = self.preprocess_patches(pages_gray)
        vis = self._encode(self.params, patches)
        prompts = [[BOS_ID, TASK_EXTRACT_ID]] * len(primitives)
        toks = self._start_generate(prompts, vis, max_new)
        return (toks, list(page_numbers))

    def collect_extract(self, handle) -> List[Dict]:
        toks, page_numbers = handle
        sequences = self._collect_tokens(toks)
        out = []
        for page_no, seq in zip(page_numbers, sequences):
            fields = self._split_fields(seq)
            out.append(
                {
                    "page_number": page_no,
                    "markdown": fields[0],
                    "entities": fields[2],
                    "summary": fields[1],
                }
            )
        return out

    def extract_batch(
        self, pages_u8: np.ndarray, page_numbers: List[int], max_new: Optional[int] = None
    ) -> List[Dict]:
        """(B, H, W, 3) uint8 page rasters -> list of page-JSON dicts."""
        return self.collect_extract(
            self.extract_batch_async(pages_u8, page_numbers, max_new)
        )

    def _split_fields(self, seq: List[int]) -> Tuple[str, str, List[str]]:
        parts: List[List[int]] = [[]]
        for t in seq:
            if t == SEP_ID:
                parts.append([])
            else:
                parts[-1].append(t)
        markdown = self.tok.decode(parts[0]) if parts else ""
        summary = self.tok.decode(parts[1]) if len(parts) > 1 else ""
        entities: List[str] = []
        if len(parts) > 2:
            current: List[int] = []
            for t in parts[2]:
                if t == UNIT_SEP:
                    if current:
                        entities.append(self.tok.decode(current))
                    current = []
                else:
                    current.append(t)
            if current:
                entities.append(self.tok.decode(current))
        return markdown, summary, entities

    def _blank_vision(self) -> jnp.ndarray:
        """Vision embedding of a blank page, cached.  The answer task is
        trained multitask through the same model with a blank page riding
        the vision tower (train/data.py::qa_batches); generation must
        present the identical 256-token prefix or the decoder runs 256
        positions off-distribution and emits extraction-style text."""
        cached = getattr(self, "_blank_vis_cache", None)
        if cached is None:
            blank = np.full((1, 64, 64, 3), 255, np.uint8)
            cached = self._encode(self.params, self.preprocess_patches(blank))
            self._blank_vis_cache = cached
        return cached

    def answer(
        self, question: str, evidence_pack: str, max_new: Optional[int] = None
    ) -> str:
        max_new = max_new or self.max_new_default
        vis = self._blank_vision()
        vis_len = vis.shape[1]
        max_seq = self.cfg.decoder.max_seq
        head = [BOS_ID, TASK_ANSWER_ID] + self.tok.encode(question) + [SEP_ID]
        # Evidence budget: whole context minus vision prefix, question head,
        # trailing SEP and a decode reserve — mirrors the training-side
        # truncation (train/data.py::qa_batches) and keeps prefill inside
        # the model context for any top_k / max_chars_per_page request.
        # _start_generate buckets the prompt length UP to a multiple of 64,
        # so the allowance must be rounded DOWN to a bucket first.
        # The reserve is min(max_new, trained span allowance): a reference-
        # scale request (8192, reference backend/app/config.py:28) must not
        # starve the evidence — trained answers EOS within ~256 tokens, so
        # evidence is sized against that, and the DECODE bound below then
        # takes every context position actually left after the real prompt
        # (never past max_seq, so the KV cache cannot be corrupted;
        # advisor r2).
        reserve = min(max_new, ANSWER_DECODE_RESERVE)
        allowed_plen = (max_seq - vis_len - reserve) // 64 * 64
        budget = allowed_plen - len(head) - 1
        ev_ids = self.tok.encode(evidence_pack)[: max(0, budget)]
        # Trailing SEP conditions generation past the evidence span, exactly
        # where training supervision begins.
        prompt = head + ev_ids + [SEP_ID]
        plen_bucketed = -(-len(prompt) // 64) * 64
        effective_new = min(max_new, max_seq - vis_len - plen_bucketed)
        seq = self._run_generate([prompt], vis, effective_new, task="answer")[0]
        # decode() skips ids with no byte expansion (specials), so BPE merge
        # tokens pass through correctly.
        return self.tok.decode(seq)

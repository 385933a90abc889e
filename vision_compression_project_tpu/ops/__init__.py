from .common import interpret_mode, cdiv, round_up
from .resize import bilinear_matrix, resize_bilinear
from .preprocess import (
    preprocess_pages,
    preprocess_pages_reference,
    patchify_normalize,
    patchify_normalize_reference,
)
from .attention import flash_attention, mha_reference
from .topk import masked_similarity, cosine_topk, masked_similarity_reference
from .dct import dct8x8_encode, dct8x8_decode, JPEG_LUMA_QTABLE
from .ring_attention import ring_attention, ring_attention_sharded_inputs

__all__ = [
    "interpret_mode",
    "cdiv",
    "round_up",
    "bilinear_matrix",
    "resize_bilinear",
    "preprocess_pages",
    "preprocess_pages_reference",
    "patchify_normalize",
    "patchify_normalize_reference",
    "flash_attention",
    "mha_reference",
    "masked_similarity",
    "masked_similarity_reference",
    "cosine_topk",
    "dct8x8_encode",
    "dct8x8_decode",
    "JPEG_LUMA_QTABLE",
    "ring_attention",
    "ring_attention_sharded_inputs",
]

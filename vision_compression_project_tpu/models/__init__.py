from .tokenizer import (
    BPETokenizer,
    ByteTokenizer,
    PAD_ID,
    BOS_ID,
    EOS_ID,
    SEP_ID,
    VOCAB_SIZE,
    get_tokenizer,
)
from .configs import (
    VisionConfig,
    DecoderConfig,
    VLMConfig,
    EmbedderConfig,
    PRESETS,
    get_preset,
)
from .vit import VisionEncoder
from .decoder import Decoder, init_cache
from .vlm import OpticalVLM, VLMRunner
from .embedder import HashNGramEmbedder, NeuralEmbedder, get_embedder

__all__ = [
    "BPETokenizer",
    "ByteTokenizer",
    "get_tokenizer",
    "PAD_ID",
    "BOS_ID",
    "EOS_ID",
    "SEP_ID",
    "VOCAB_SIZE",
    "VisionConfig",
    "DecoderConfig",
    "VLMConfig",
    "EmbedderConfig",
    "PRESETS",
    "get_preset",
    "VisionEncoder",
    "Decoder",
    "init_cache",
    "OpticalVLM",
    "VLMRunner",
    "HashNGramEmbedder",
    "NeuralEmbedder",
    "get_embedder",
]

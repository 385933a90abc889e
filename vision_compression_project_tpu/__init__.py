"""vision_compression_project_tpu: a TPU-native optical-context-compression
document-QA framework (JAX / XLA / Pallas / pjit).

Re-implements, TPU-first, the capabilities of the reference
`Anantaverma20/vision-compression-project` (see SURVEY.md): PDF pages are
rasterized by a batched C++ engine, preprocessed by fused Pallas
resize/normalize/patchify kernels, encoded by an on-mesh vision encoder,
decoded to structured per-page JSON by a constrained LM decoder, embedded by a
batched on-TPU embedding model into an HBM-resident vector index, and queried
via on-device top-k cosine retrieval plus TPU-served cited answer generation.

Layer map (bottom-up):
  parallel/  device mesh, shardings, collectives (the comm backend over ICI/DCN)
  ops/       Pallas kernels + XLA compute paths (preprocess, attention, topk, DCT)
  models/    tokenizer, vision encoder, LM decoder, VLM, embedders
  index/     HBM-resident vector index with metadata filtering
  raster/    C++ PDF engine (page count, text layer, rasterization)
  pipeline/  extract / ingest / qa orchestrators (reference-schema compatible)
  serve/     HTTP service byte-compatible with the reference FastAPI surface
  train/     pjit-sharded training step + checkpointing
"""

__version__ = "0.1.0"

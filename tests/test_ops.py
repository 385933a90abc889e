import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_compression_project_tpu.ops import (
    JPEG_LUMA_QTABLE,
    cosine_topk,
    dct8x8_decode,
    dct8x8_encode,
    flash_attention,
    masked_similarity,
    masked_similarity_reference,
    mha_reference,
    patchify_normalize,
    patchify_normalize_reference,
    preprocess_pages,
    preprocess_pages_reference,
    resize_bilinear,
)


def test_resize_matches_jax_image():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(2, 96, 64, 3), dtype=np.uint8)
    got = resize_bilinear(jnp.asarray(img), 48, 32)
    want = jax.image.resize(
        jnp.asarray(img, jnp.float32), (2, 48, 32, 3), "bilinear", antialias=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.75)


def test_resize_identity():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(1, 32, 32, 1), dtype=np.uint8)
    out = resize_bilinear(jnp.asarray(img), 32, 32)
    np.testing.assert_allclose(np.asarray(out), img.astype(np.float32), atol=1e-4)


def test_patchify_normalize_matches_reference():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, size=(2, 64, 128, 3)).astype(np.float32)
    got = patchify_normalize(jnp.asarray(img), patch=16)
    want = patchify_normalize_reference(jnp.asarray(img), patch=16)
    assert got.shape == (2, (64 // 16) * (128 // 16), 16 * 16 * 3)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-2
    )


def test_preprocess_pages_end_to_end():
    rng = np.random.default_rng(3)
    pages = rng.integers(0, 256, size=(2, 200, 150, 3), dtype=np.uint8)
    got = preprocess_pages(jnp.asarray(pages), target_h=64, target_w=64, patch=16)
    want = preprocess_pages_reference(
        jnp.asarray(pages), target_h=64, target_w=64, patch=16
    )
    assert got.shape == (2, 16, 768)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_reference(causal):
    rng = np.random.default_rng(4)
    b, h, s, d = 2, 4, 256, 64
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    got = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal
    )
    want = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_attention_gqa_and_kvlen():
    rng = np.random.default_rng(5)
    b, h, hkv, s, d = 2, 8, 2, 128, 32
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    kv_len = np.array([128, 57], np.int32)
    got = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_len=jnp.asarray(kv_len)
    )
    want = mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_len=jnp.asarray(kv_len)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_masked_similarity_and_topk():
    rng = np.random.default_rng(6)
    n, d, bq = 512, 64, 3
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mask = (rng.uniform(size=n) > 0.5).astype(np.float32)

    got = masked_similarity(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(mask), block_n=128)
    want = masked_similarity_reference(
        jnp.asarray(emb), jnp.asarray(q), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    vals, idx = cosine_topk(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(mask), k=5)
    dense = np.asarray(want)
    for b in range(bq):
        expect = np.argsort(-dense[b])[:5]
        np.testing.assert_array_equal(np.asarray(idx[b]), expect)


def test_dct_roundtrip_quality():
    rng = np.random.default_rng(7)
    # Smooth-ish image: DCT quantization should reconstruct closely.
    x = np.linspace(0, 255, 64 * 64).reshape(64, 64)
    img = (x + rng.uniform(-8, 8, size=(64, 64))).clip(0, 255).astype(np.uint8)
    coeffs = dct8x8_encode(jnp.asarray(img))
    assert coeffs.dtype == jnp.int16
    back = dct8x8_decode(coeffs)
    err = np.abs(back.astype(np.int32) - img.astype(np.int32))
    assert err.mean() < 6.0
    # Sparsity: most quantized coefficients are zero (compressibility).
    assert (np.asarray(coeffs) == 0).mean() > 0.6

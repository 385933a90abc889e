import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_compression_project_tpu.ops.attention import (
    flash_attention,
    mha_reference,
)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_gradients_match_reference(causal):
    rng = np.random.default_rng(0)
    b, h, s, d = 1, 2, 128, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-3)


def test_flash_attention_grad_gqa_kvlen():
    rng = np.random.default_rng(1)
    b, h, hkv, s, d = 2, 4, 2, 128, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    kv_len = jnp.asarray([128, 77], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_len=kv_len, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, kv_len=kv_len, causal=True) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-3)


@pytest.mark.parametrize("s", [130, 222, 300])
@pytest.mark.slow
def test_flash_attention_ragged_length_matches_reference(s):
    """Non-block-multiple sequence lengths (e.g. the 2046-token VLM training
    forward) must run the padded flash path with identical values and
    gradients to the reference — forward pad rows sliced, key pads masked."""
    rng = np.random.default_rng(2)
    b, h, hkv, d = 2, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)

    out_f = flash_attention(q, k, v, causal=True)
    out_r = mha_reference(q, k, v, causal=True)
    assert out_f.shape == (b, h, s, d)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=2e-3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-3)

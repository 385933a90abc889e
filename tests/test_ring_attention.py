import numpy as np
import jax.numpy as jnp
import pytest

from vision_compression_project_tpu.ops.attention import mha_reference
from vision_compression_project_tpu.ops.ring_attention import (
    ring_attention_sharded_inputs,
)
from vision_compression_project_tpu.parallel import MeshConfig, build_mesh


@pytest.fixture(scope="module")
def mesh_seq():
    return build_mesh(MeshConfig(data=1, seq=8, expert=1, model=1))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(mesh_seq, causal):
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 64, 16  # seq 64 sharded 8 ways -> 8 per chip
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    got = ring_attention_sharded_inputs(
        mesh_seq, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal
    )
    want = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.slow
def test_ring_attention_ragged_kv_len(mesh8):
    """Per-example kv_len masks ride the ring (round 3): sharded ragged
    attention matches the reference mask, forward and reverse."""
    import jax

    from vision_compression_project_tpu.ops.attention import mha_reference

    rng = np.random.default_rng(11)
    b, h, s, d = 4, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    kv_len = jnp.asarray([16, 9, 5, 12], jnp.int32)

    ref = mha_reference(q, k, v, kv_len=kv_len, causal=True)
    with mesh8:
        got = ring_attention_sharded_inputs(
            mesh8, q, k, v, causal=True, kv_len=kv_len
        )
    # Rows past kv_len attend to nothing in the reference too; compare the
    # valid region per example.
    for i in range(b):
        n = int(kv_len[i])
        np.testing.assert_allclose(
            np.asarray(got)[i, :, :n], np.asarray(ref)[i, :, :n],
            rtol=2e-5, atol=2e-5,
        )

    # Reverse mode agrees on the valid region as well.
    def loss_ring(qq):
        with mesh8:
            o = ring_attention_sharded_inputs(
                mesh8, qq, k, v, causal=True, kv_len=kv_len
            )
        mask = (jnp.arange(s)[None, :] < kv_len[:, None]).astype(jnp.float32)
        return jnp.sum(o * mask[:, None, :, None])

    def loss_ref(qq):
        o = mha_reference(qq, k, v, kv_len=kv_len, causal=True)
        mask = (jnp.arange(s)[None, :] < kv_len[:, None]).astype(jnp.float32)
        return jnp.sum(o * mask[:, None, :, None])

    g_ring = jax.grad(loss_ring)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(
        np.asarray(g_ring), np.asarray(g_ref), rtol=3e-5, atol=3e-5
    )

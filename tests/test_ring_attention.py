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

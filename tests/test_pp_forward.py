import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vision_compression_project_tpu.models.configs import DecoderConfig
from vision_compression_project_tpu.models.decoder import Decoder
from vision_compression_project_tpu.parallel import MeshConfig, build_mesh
from vision_compression_project_tpu.train.pp_forward import (
    pipelined_decoder_hidden,
)


@pytest.fixture(scope="module")
def mesh_pp4():
    return build_mesh(MeshConfig(data=2, seq=1, expert=1, model=4))


@pytest.mark.slow
def test_pipelined_decoder_matches_sequential(mesh_pp4):
    cfg = DecoderConfig(
        dim=64, depth=4, heads=4, kv_heads=2, head_dim=16, max_seq=64,
        dtype="float32",
    )
    decoder = Decoder(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 64)), jnp.float32
    )
    params = nn.meta.unbox(decoder.init(jax.random.PRNGKey(0), x)["params"])

    # Sequential reference: run the blocks (no final norm/unembed).
    h_ref = x
    from vision_compression_project_tpu.models.decoder import DecoderBlock

    block = DecoderBlock(cfg, use_moe=False)
    for i in range(cfg.depth):
        h_ref = block.apply({"params": params[f"block_{i}"]}, h_ref)

    # Pipelined: 4 microbatches of 2 sequences each through 4 stages.
    mbs = jnp.stack([x, x * 0.5, x * 2.0, -x])
    h_pp = pipelined_decoder_hidden(cfg, params, mbs, mesh_pp4, axis_name="model")
    assert h_pp.shape == mbs.shape
    np.testing.assert_allclose(
        np.asarray(h_pp[0]), np.asarray(h_ref), atol=2e-4
    )
    # Each microbatch independently equals its sequential run.
    h_ref2 = mbs[2]
    for i in range(cfg.depth):
        h_ref2 = block.apply({"params": params[f"block_{i}"]}, h_ref2)
    np.testing.assert_allclose(np.asarray(h_pp[2]), np.asarray(h_ref2), atol=2e-4)

"""Sequence-parallel MODEL forward (VERDICT r1 item 6).

The ring-attention SP path must engage from inside `Decoder.__call__` when
the active mesh shards `seq` (models/layers.py::Attention._seq_parallel_attn)
— not just as a standalone op — and the seq-sharded forward must match the
single-chip forward bit-for-bit up to bf16 reduction-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

import importlib

ring_mod = importlib.import_module(
    "vision_compression_project_tpu.ops.ring_attention"
)
from vision_compression_project_tpu.models.configs import DecoderConfig
from vision_compression_project_tpu.models.decoder import Decoder
from vision_compression_project_tpu.parallel import MeshConfig, build_mesh


@pytest.fixture(scope="module")
def decoder_and_params():
    cfg = DecoderConfig(
        vocab=64, dim=64, depth=2, heads=4, kv_heads=2, head_dim=16,
        max_seq=256,
    )
    model = Decoder(cfg)
    x = jnp.zeros((4, 64, cfg.dim), jnp.bfloat16)
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), x)["params"])
    return model, params


def test_decoder_forward_seq_sharded_matches_single_chip(
    decoder_and_params, monkeypatch
):
    model, params = decoder_and_params
    x = (
        jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64)) * 0.3
    ).astype(jnp.bfloat16)

    # Single-chip reference: no mesh context -> dense/flash kernels.
    ref = np.asarray(model.apply({"params": params}, x))

    # DP x SP x TP mesh; assert the ring actually runs (no silent fallback).
    calls = []
    orig = ring_mod.ring_attention

    def spying_ring(*args, **kwargs):
        calls.append(kwargs.get("axis_name", "seq"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(ring_mod, "ring_attention", spying_ring)

    mesh = build_mesh(MeshConfig(data=2, seq=2, expert=1, model=2))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))
    with mesh:
        out = jax.jit(lambda p, a: model.apply({"params": p}, a))(params, xs)
    out = np.asarray(out)

    assert len(calls) == 2, "ring attention must run once per block"
    np.testing.assert_allclose(out, ref, atol=0.08, rtol=0.05)


@pytest.mark.slow
def test_decoder_seq_mesh_grad_flows(decoder_and_params):
    """Reverse-mode AD through the ring (shard_map + static fori_loop):
    the SP forward is usable in the train step, not just inference."""
    model, params = decoder_and_params
    x = (
        jax.random.normal(jax.random.PRNGKey(2), (2, 32, 64)) * 0.3
    ).astype(jnp.bfloat16)

    def loss_fn(p, a):
        return jnp.mean(jnp.square(model.apply({"params": p}, a)))

    ref_grads = jax.grad(loss_fn)(params, x)

    mesh = build_mesh(MeshConfig(data=2, seq=2, expert=1, model=2))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))
    with mesh:
        sp_grads = jax.jit(jax.grad(loss_fn))(params, xs)

    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_sp = jax.tree_util.tree_leaves(sp_grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat_sp)
    for a, b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=0.05, rtol=0.1,
        )

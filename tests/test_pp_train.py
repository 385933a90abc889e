"""PP training step (VERDICT r1 item 7): loss + grads through the GPipe
decoder must match the sequential decoder exactly, reduce loss over steps,
and compose with DP (batch sharded over the data axis of the same mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_compression_project_tpu.models.configs import DecoderConfig
from vision_compression_project_tpu.models.decoder import Decoder
from vision_compression_project_tpu.models.tokenizer import PAD_ID
from vision_compression_project_tpu.parallel import MeshConfig, build_mesh
from vision_compression_project_tpu.train.pp_train import (
    make_pp_train_step,
    pp_lm_loss,
)
from vision_compression_project_tpu.train.train_step import TrainState


# vocab must cover the special ids (PAD_ID=256 etc.) or embedding lookups
# go out of bounds and fill with NaN.
CFG = DecoderConfig(
    vocab=300, dim=32, depth=4, heads=4, kv_heads=2, head_dim=8,
    max_seq=64, dtype="float32",
)


@pytest.fixture(scope="module")
def mesh_pp():
    return build_mesh(MeshConfig(data=2, seq=1, expert=1, model=4))


def _init_decoder(model, cfg, seed):
    """Init ALL decoder params (embed + blocks + unembed) in one trace."""

    def trace_all(mdl, ids):
        # __call__ covers blocks + norm_f + unembed; embed_tokens the table.
        return mdl(mdl.embed_tokens(ids))

    ids = jnp.zeros((1, 4), jnp.int32)
    return nn.meta.unbox(
        model.init(jax.random.PRNGKey(seed), ids, method=trace_all)["params"]
    )


@pytest.fixture(scope="module")
def setup(mesh_pp):
    model = Decoder(CFG)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 250, size=(8, 33)).astype(np.int32)
    ids[:, -4:] = PAD_ID  # padded tail exercises the loss mask
    params = _init_decoder(model, CFG, 0)
    return model, params, jnp.asarray(ids)


def seq_loss(model, params, token_ids):
    import optax

    ids_in, targets = token_ids[:, :-1], token_ids[:, 1:]
    emb = model.apply({"params": params}, ids_in, method=Decoder.embed_tokens)
    logits = model.apply({"params": params}, emb)
    mask = (targets != PAD_ID).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), targets
    )
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def test_pp_grads_match_sequential(mesh_pp, setup):
    model, params, ids = setup
    ref_loss = seq_loss(model, params, ids)
    ref_grads = jax.grad(lambda p: seq_loss(model, p, ids))(params)

    ids_sharded = jax.device_put(
        ids, NamedSharding(mesh_pp, P("data", None))
    )
    with mesh_pp:
        pp_loss = jax.jit(
            lambda p, t: pp_lm_loss(CFG, p, t, mesh_pp, n_micro=4)
        )(params, ids_sharded)
        pp_grads = jax.jit(
            jax.grad(lambda p: pp_lm_loss(CFG, p, ids_sharded, mesh_pp, n_micro=4))
        )(params)

    assert np.isfinite(float(ref_loss)) and np.isfinite(float(pp_loss))
    np.testing.assert_allclose(
        float(pp_loss), float(ref_loss), rtol=1e-5, atol=1e-6
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_pp = jax.tree_util.tree_leaves(pp_grads)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        bb, aa = np.asarray(b), np.asarray(a)
        assert np.isfinite(bb).all(), jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            bb, aa, rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pp_train_step_reduces_loss(mesh_pp, setup):
    model, params, ids = setup
    tx, step = make_pp_train_step(CFG, mesh_pp, lr=3e-3, n_micro=4)
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    ids_sharded = jax.device_put(
        ids, NamedSharding(mesh_pp, P("data", None))
    )
    losses = []
    with mesh_pp:
        for _ in range(12):
            state, loss = step(state, ids_sharded)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
    assert np.isfinite(losses).all()


def test_pp_train_moe_uniform(mesh_pp):
    """Uniform-MoE decoder (expert_every=1) trains through the pipeline."""
    cfg = DecoderConfig(
        vocab=300, dim=32, depth=4, heads=4, kv_heads=2, head_dim=8,
        max_seq=64, dtype="float32", num_experts=4, expert_every=1,
    )
    model = Decoder(cfg)
    params = _init_decoder(model, cfg, 1)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, 250, size=(8, 17)).astype(np.int32))

    tx, step = make_pp_train_step(cfg, mesh_pp, lr=3e-3, n_micro=2)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    ids_sharded = jax.device_put(ids, NamedSharding(mesh_pp, P("data", None)))
    losses = []
    with mesh_pp:
        for _ in range(10):
            state, loss = step(state, ids_sharded)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses

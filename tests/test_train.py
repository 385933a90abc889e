import jax
import jax.numpy as jnp
import numpy as np

from vision_compression_project_tpu.models import get_preset
from vision_compression_project_tpu.models.tokenizer import PAD_ID
from vision_compression_project_tpu.train import (
    make_train_state,
    restore_checkpoint,
    save_checkpoint,
    train_step,
)
from vision_compression_project_tpu.train.train_step import make_jitted_train_step
import pytest


def _batch(cfg, b=2, text_len=16, seed=0):
    rng = np.random.default_rng(seed)
    grid = cfg.vision.grid
    patch_dim = cfg.vision.patch ** 2 * 3
    ids = rng.integers(0, 255, size=(b, text_len)).astype(np.int32)
    ids[:, -3:] = PAD_ID
    return {
        "patch_tokens": jnp.asarray(
            rng.standard_normal((b, grid * grid, patch_dim)), jnp.bfloat16
        ),
        "token_ids": jnp.asarray(ids),
    }


@pytest.mark.slow
def test_train_step_reduces_loss_dense(mesh8):
    cfg = get_preset("tiny")
    model, tx, state, shardings = make_train_state(cfg, mesh8, lr=1e-2)
    step_fn, batch_shardings = make_jitted_train_step(model, tx, mesh8, shardings)
    batch = _batch(cfg)
    batch = {
        k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()
    }
    with mesh8:
        state, loss0 = step_fn(state, batch)
        losses = [float(loss0)]
        for _ in range(5):
            state, loss = step_fn(state, batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(state.step)) == 6


@pytest.mark.slow
def test_train_step_moe_ep(mesh8):
    """MoE decoder trains with experts sharded over the expert axis."""
    cfg = get_preset("tiny_moe")
    model, tx, state, shardings = make_train_state(cfg, mesh8, lr=1e-2)
    step_fn, batch_shardings = make_jitted_train_step(model, tx, mesh8, shardings)
    batch = _batch(cfg, seed=1)
    batch = {k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()}
    with mesh8:
        state, loss0 = step_fn(state, batch)
        state, loss1 = step_fn(state, batch)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    # Expert kernels are physically sharded over the expert axis.
    w = state.params["decoder"]["block_0"]["mlp"]["w_gate"]
    spec = w.sharding.spec
    assert "expert" in str(spec)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, mesh8):
    cfg = get_preset("tiny")
    model, tx, state, _ = make_train_state(cfg, mesh8)
    path = save_checkpoint(tmp_path / "ckpt", state, step=3)
    assert path.name == "step_00000003"
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), jax.device_get(state)
    )
    restored = restore_checkpoint(tmp_path / "ckpt", abstract)
    assert restored is not None
    a = jax.device_get(state.params["proj"]["kernel"])
    b = restored.params["proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

import jax
import jax.numpy as jnp
import numpy as np

from vision_compression_project_tpu.models.configs import EmbedderConfig
import pytest

from vision_compression_project_tpu.train.embedder_train import (
    embedder_train_step,
    make_embedder_train_state,
    synthetic_pair_batches,
)

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host


def test_contrastive_training_reduces_loss_and_improves_retrieval():
    cfg = EmbedderConfig(dim=64, depth=1, heads=2, max_seq=256)
    model, tx, params, opt_state = make_embedder_train_state(cfg, lr=3e-4)
    step_fn = jax.jit(lambda p, o, b: embedder_train_step(model, tx, p, o, b))
    data = synthetic_pair_batches(16, seed=0)
    batch0 = {k: jnp.asarray(v) for k, v in next(data).items()}

    def retrieval_acc(p, b):
        q = model.apply({"params": p}, b["q_ids"], b["q_len"])
        d = model.apply({"params": p}, b["d_ids"], b["d_len"])
        pred = jnp.argmax(q @ d.T, axis=1)
        return float(jnp.mean(pred == jnp.arange(q.shape[0])))

    acc_before = retrieval_acc(params, batch0)
    params1, opt_state, loss0 = step_fn(params, opt_state, batch0)
    losses = [float(loss0)]
    for _ in range(150):
        batch = {k: jnp.asarray(v) for k, v in next(data).items()}
        params1, opt_state, loss = step_fn(params1, opt_state, batch)
        losses.append(float(loss))
    import math

    assert losses[-1] < losses[0], losses[:3] + losses[-3:]
    # Below the uniform-collapse floor ln(B): the pairs are being separated.
    assert losses[-1] < math.log(16), losses[-1]
    acc_after = retrieval_acc(params1, batch0)
    assert acc_after > acc_before, (acc_before, acc_after)
    assert acc_after >= 0.2, (acc_before, acc_after)

"""PP training step (VERDICT r1 item 7): loss + grads through the GPipe
decoder must match the sequential decoder exactly, reduce loss over steps,
and compose with DP (batch sharded over the data axis of the same mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_compression_project_tpu.models.configs import (
    DecoderConfig,
    VisionConfig,
    VLMConfig,
)
from vision_compression_project_tpu.models.decoder import Decoder
from vision_compression_project_tpu.models.tokenizer import PAD_ID
from vision_compression_project_tpu.models.vlm import OpticalVLM
from vision_compression_project_tpu.parallel import MeshConfig, build_mesh
from vision_compression_project_tpu.train.pp_train import (
    make_pp_train_step,
    make_pp_vlm_train_step,
    pp_lm_loss,
    pp_vlm_loss,
)
from vision_compression_project_tpu.train.train_step import (
    MOE_AUX_WEIGHT,
    TrainState,
    make_optimizer,
    vlm_loss,
)


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


# ---------------------------------------------------------------------------
# PP over the FULL VLM step (VERDICT r2 item 6): vision prefix outside the
# pipeline, decoder blocks as GPipe stages, MoE aux restored.
# ---------------------------------------------------------------------------

VLM_CFG = VLMConfig(
    vision=VisionConfig(
        image_size=64, patch=16, dim_local=32, dim_global=32,
        depth_local=1, depth_global=1, heads_local=2, heads_global=2,
        window=2, downsample=2, dtype="float32",
    ),
    decoder=DecoderConfig(
        vocab=300, dim=32, depth=4, heads=4, kv_heads=2, head_dim=8,
        max_seq=96, dtype="float32",
    ),
)

VLM_CFG_MOE = VLMConfig(
    vision=VLM_CFG.vision,
    decoder=DecoderConfig(
        vocab=300, dim=32, depth=4, heads=4, kv_heads=2, head_dim=8,
        max_seq=96, dtype="float32", num_experts=4, expert_every=1,
    ),
)


def _init_vlm(cfg, seed):
    model = OpticalVLM(cfg)
    grid = cfg.vision.grid
    patch_dim = cfg.vision.patch ** 2 * 3
    pages = jnp.zeros((1, grid * grid, patch_dim), jnp.float32)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(seed), pages, ids)["params"]
    )
    return model, params


def _vlm_batch(cfg, b=4, text_len=17, seed=0, with_mask=False):
    rng = np.random.default_rng(seed)
    grid = cfg.vision.grid
    patch_dim = cfg.vision.patch ** 2 * 3
    ids = rng.integers(5, 250, size=(b, text_len)).astype(np.int32)
    ids[:, -3:] = PAD_ID
    batch = {
        "patch_tokens": jnp.asarray(
            rng.standard_normal((b, grid * grid, patch_dim)), jnp.float32
        ),
        "token_ids": jnp.asarray(ids),
    }
    if with_mask:
        mask = np.ones_like(ids)
        mask[:, : text_len // 2] = 0  # supervise only the tail span
        batch["loss_mask"] = jnp.asarray(mask)
    return batch


def _shard_batch(mesh, batch):
    return {
        k: jax.device_put(
            v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
        )
        for k, v in batch.items()
    }


def test_pp_vlm_grads_match_sequential(mesh_pp):
    """Dense VLM: PP loss and grads == the TP-path vlm_loss exactly."""
    model, params = _init_vlm(VLM_CFG, 0)
    batch = _vlm_batch(VLM_CFG, with_mask=True)
    ref_loss = vlm_loss(model, params, batch)
    ref_grads = jax.grad(lambda p: vlm_loss(model, p, batch))(params)

    sharded = _shard_batch(mesh_pp, batch)
    with mesh_pp:
        pp_fn = lambda p, bt: pp_vlm_loss(VLM_CFG, p, bt, mesh_pp, n_micro=2)
        pp_loss = jax.jit(pp_fn)(params, sharded)
        pp_grads = jax.jit(jax.grad(lambda p: pp_fn(p, sharded)))(params)

    assert np.isfinite(float(ref_loss)) and np.isfinite(float(pp_loss))
    np.testing.assert_allclose(
        float(pp_loss), float(ref_loss), rtol=1e-5, atol=1e-6
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_pp = jax.tree_util.tree_leaves(pp_grads)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pp_vlm_moe_aux_matches_microbatch_reference(mesh_pp):
    """Uniform-MoE VLM: the pipelined Switch aux equals the documented
    semantics — mean over microbatches of the per-microbatch sown aux —
    computed here by slicing the batch and re-applying the model."""
    model, params = _init_vlm(VLM_CFG_MOE, 1)
    batch = _vlm_batch(VLM_CFG_MOE, b=4, seed=1)
    n_micro = 2

    # Reference: apply the model per microbatch — Switch routing drops
    # tokens against a capacity derived from the apply's OWN token count,
    # so hidden states (hence CE) are microbatch-composition-dependent,
    # exactly like the pipeline's per-microbatch stages.
    import optax

    b = batch["token_ids"].shape[0]
    mb = b // n_micro
    logit_chunks, aux_terms = [], []
    for i in range(n_micro):
        chunk_logits, mut = model.apply(
            {"params": params},
            batch["patch_tokens"][i * mb : (i + 1) * mb],
            batch["token_ids"][i * mb : (i + 1) * mb, :-1],
            mutable=["losses"],
        )
        logit_chunks.append(chunk_logits)
        aux_terms.append(
            sum(
                jnp.mean(a)
                for a in jax.tree_util.tree_leaves(mut.get("losses", {}))
            )
        )
    logits = jnp.concatenate(logit_chunks, axis=0)
    targets = batch["token_ids"][:, 1:]
    vis_len = logits.shape[1] - targets.shape[1]
    mask = (targets != PAD_ID).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, vis_len:].astype(jnp.float32), targets
    )
    ref_ce = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    ref_aux = sum(aux_terms) / n_micro
    assert float(ref_aux) > 0.0  # MoE actually routed
    ref_total = float(ref_ce + MOE_AUX_WEIGHT * ref_aux)

    sharded = _shard_batch(mesh_pp, batch)
    with mesh_pp:
        pp_loss = jax.jit(
            lambda p, bt: pp_vlm_loss(
                VLM_CFG_MOE, p, bt, mesh_pp, n_micro=n_micro
            )
        )(params, sharded)

    np.testing.assert_allclose(float(pp_loss), ref_total, rtol=1e-5, atol=1e-6)
    # The aux is material: dropping it must change the loss.
    assert abs(float(pp_loss) - float(ref_ce)) > 1e-7


def test_pp_vlm_train_step_reduces_loss(mesh_pp):
    """The CLI-exposed PP-VLM step (scripts/train_vlm.py --pp_microbatches)
    trains: loss reduces, step counter advances, loss_mask respected."""
    _, params = _init_vlm(VLM_CFG_MOE, 2)
    tx = make_optimizer(3e-3)
    step_fn, batch_shardings = make_pp_vlm_train_step(
        VLM_CFG_MOE, tx, mesh_pp, n_micro=2
    )
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    batch = _vlm_batch(VLM_CFG_MOE, b=4, seed=3, with_mask=True)
    batch = {k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()}
    losses = []
    with mesh_pp:
        for _ in range(10):
            state, loss = step_fn(state, batch)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(jax.device_get(state.step)) == 10


def test_pp_vlm_bf16_and_single_stage(mesh_pp):
    """Regressions from driving the CLI (round 3): (a) bf16 activations
    through the pipeline used to CHECK-fail XLA CPU's AllReducePromotion
    pass (copy-opcode all-reduce from a bf16 psum_invariant/pcast); (b) a
    size-1 stage axis used to trip the SPMD partitioner — it now takes a
    scan path with identical semantics."""
    import dataclasses

    cfg_bf16 = VLMConfig(
        vision=dataclasses.replace(VLM_CFG.vision, dtype="bfloat16"),
        decoder=dataclasses.replace(
            VLM_CFG.decoder, dtype="bfloat16", num_experts=4, expert_every=1
        ),
    )
    _, params = _init_vlm(cfg_bf16, 4)
    batch = _vlm_batch(cfg_bf16, b=4, seed=5)
    sharded = _shard_batch(mesh_pp, batch)
    with mesh_pp:
        loss, grads = jax.jit(
            jax.value_and_grad(
                lambda p: pp_vlm_loss(cfg_bf16, p, sharded, mesh_pp, n_micro=2)
            )
        )(params)
    assert np.isfinite(float(loss))
    assert all(
        np.isfinite(np.asarray(g, np.float32)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )

    # Single-stage (model=1): scan path, same loss as the sequential TP loss.
    mesh1 = build_mesh(MeshConfig(data=8, model=1))
    model, params = _init_vlm(VLM_CFG, 5)
    batch = _vlm_batch(VLM_CFG, b=8, seed=6)
    ref = vlm_loss(model, params, batch)
    sharded = _shard_batch(mesh1, batch)
    with mesh1:
        got = jax.jit(
            lambda p, bt: pp_vlm_loss(VLM_CFG, p, bt, mesh1, n_micro=2)
        )(params, sharded)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)

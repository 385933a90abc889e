"""pjit-sharded VLM training step.

The reference had no training at all (its models were cloud APIs); this is
the framework's path to the trained checkpoints that make the VLM/embedder
engines real.  Parallelism follows parallel/sharding.py: batch over `data`
(DP), attention-head/MLP/vocab dims over `model` (TP), MoE experts over
`expert` (EP), and activation sequence over `seq` (SP) — all expressed as
shardings on one jitted step; XLA inserts the collectives (psum of grads
over data, all-reduces inside TP layers, all-to-alls for EP dispatch).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.configs import VLMConfig
from ..models.tokenizer import PAD_ID
from ..models.vlm import OpticalVLM
from ..parallel.mesh import AXIS_DATA
from ..parallel.sharding import LOGICAL_RULES

MOE_AUX_WEIGHT = 0.01


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):  # simple pytree registration
        return (self.params, self.opt_state, self.step), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)


def make_optimizer(lr=3e-4, weight_decay: float = 0.01):
    """AdamW with grad clipping.  `lr` may be a float (constant) or any
    optax schedule — training CLIs pass a warmup-cosine so the late-stage
    Adam noise floor decays with it (constant peak lr measurably stalls
    generation quality after teacher-forced loss converges, round 5)."""
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


def cosine_lr(peak: float, total_steps: int, warmup: int = 100,
              end_frac: float = 0.1):
    """Standard warmup -> cosine decay to end_frac x peak over the run."""
    warmup = min(warmup, max(1, total_steps // 10))
    return optax.warmup_cosine_decay_schedule(
        init_value=peak * 0.1, peak_value=peak, warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1), end_value=peak * end_frac,
    )


def vlm_loss(model: OpticalVLM, params, batch: Dict) -> jnp.ndarray:
    """Next-token CE over the text segment (vision prefix has no targets),
    plus the Switch-MoE load-balancing auxiliary."""
    logits, mutables = model.apply(
        {"params": params},
        batch["patch_tokens"],
        batch["token_ids"][:, :-1],
        mutable=["losses"],
    )
    vis_len = logits.shape[1] - (batch["token_ids"].shape[1] - 1)
    text_logits = logits[:, vis_len:]
    targets = batch["token_ids"][:, 1:]
    mask = (targets != PAD_ID).astype(jnp.float32)
    # Optional per-token supervision mask (aligned with token_ids): the
    # answer task supervises ONLY the answer span — without it, ~90% of the
    # gradient goes to modelling the evidence pack and the answer format
    # never emerges from the dilution (train/data.py::qa_batches).
    if "loss_mask" in batch:
        mask = mask * batch["loss_mask"][:, 1:].astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        text_logits.astype(jnp.float32), targets
    )
    loss = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    aux_losses = jax.tree_util.tree_leaves(mutables.get("losses", {}))
    if aux_losses:
        loss = loss + MOE_AUX_WEIGHT * sum(jnp.mean(a) for a in aux_losses)
    return loss


def _param_shardings(params, mesh: Mesh):
    spec_tree = nn.get_partition_spec(params)
    spec_tree = nn.logical_to_mesh(spec_tree, rules=LOGICAL_RULES)

    def to_sharding(spec):
        if not isinstance(spec, P):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(
        to_sharding, spec_tree, is_leaf=lambda x: isinstance(x, P) or x is None
    )


def make_train_state(
    cfg: VLMConfig,
    mesh: Mesh,
    rng: Optional[jax.Array] = None,
    lr: float = 3e-4,
):
    """Initialize params/optimizer directly sharded over the mesh."""
    model = OpticalVLM(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    patch_dim = cfg.vision.patch ** 2 * 3
    grid = cfg.vision.grid
    dummy_pages = jnp.zeros((1, grid * grid, patch_dim), jnp.bfloat16)
    dummy_ids = jnp.zeros((1, 8), jnp.int32)

    boxed = jax.eval_shape(
        lambda r: model.init(r, dummy_pages, dummy_ids)["params"], rng
    )
    shardings = _param_shardings(boxed, mesh)

    def init_fn(r):
        return nn.meta.unbox(model.init(r, dummy_pages, dummy_ids)["params"])

    params = jax.jit(init_fn, out_shardings=shardings)(rng)
    tx = make_optimizer(lr)
    opt_shardings = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()),
        jax.eval_shape(tx.init, jax.eval_shape(lambda: params)),
        is_leaf=lambda x: not isinstance(x, (dict, tuple, list)),
    )
    # Let opt-state moments inherit the param shardings via jit propagation.
    opt_state = jax.jit(tx.init)(params)
    del opt_shardings
    state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    return model, tx, state, shardings


def train_step(model: OpticalVLM, tx, state: TrainState, batch: Dict):
    """One SGD step; jit this with batch sharded over the data axis."""
    loss, grads = jax.value_and_grad(
        lambda p: vlm_loss(model, p, batch)
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss


def make_jitted_train_step(model, tx, mesh: Mesh, param_shardings):
    """jit with explicit in/out shardings: params as annotated, batch over
    data, loss replicated."""
    batch_sharding = {
        "patch_tokens": NamedSharding(mesh, P(AXIS_DATA, None, None)),
        "token_ids": NamedSharding(mesh, P(AXIS_DATA, None)),
        "loss_mask": NamedSharding(mesh, P(AXIS_DATA, None)),
    }

    def step(state, batch):
        return train_step(model, tx, state, batch)

    return jax.jit(step, donate_argnums=(0,)), batch_sharding

"""Pipeline-parallel decoder forward.

Wires the generic GPipe schedule (parallel/pipeline.py) into the Decoder:
the (identical-structure) transformer blocks are grouped into S stages whose
params stack along a leading axis sharded over a mesh axis, and microbatches
stream through the ring.  Used for training/eval forward passes when the
decoder depth doesn't fit one chip's HBM alongside activations; generation
keeps the TP path (pipeline bubbles are hostile to token-by-token decode).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..models.configs import DecoderConfig
from ..models.decoder import DecoderBlock
from ..models.layers import plain_partitioning
from ..parallel.pipeline import gpipe, shard_stacked_params


def stack_block_params(decoder_params: Dict, depth: int, n_stages: int):
    """Stack per-block param pytrees into a leading (n_stages, ...) axis,
    grouping depth/n_stages consecutive blocks per stage.

    Requires a uniform (dense-MLP) decoder: all blocks share one structure.
    Returns a pytree with leaves shaped (n_stages, layers_per_stage, ...).
    """
    assert depth % n_stages == 0, (depth, n_stages)
    per_stage = depth // n_stages
    blocks = [decoder_params[f"block_{i}"] for i in range(depth)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, per_stage) + x.shape[1:]), stacked
    )


def pipelined_decoder_hidden(
    cfg: DecoderConfig,
    decoder_params: Dict,
    x_microbatches: jnp.ndarray,
    mesh,
    axis_name: str = "model",
    use_moe: bool = False,
    with_aux: bool = False,
) -> jnp.ndarray:
    """(M, mb, S, dim) embedded microbatches -> (M, mb, S, dim) hidden states
    after all decoder blocks, computed as an S-stage GPipe over `axis_name`.

    use_moe=True pipelines a uniformly-MoE decoder (cfg.expert_every == 1;
    see train/pp_train.py for the scoping rationale).  Caller applies the
    final norm + unembedding (replicated, cheap).

    with_aux=True additionally returns the Switch load-balancing auxiliary
    (sum over blocks, microbatch-mean): flax `sow` is a no-op under the
    pipeline's immutable apply, so the stage runner re-applies each block
    with mutable=["losses"] and hands the captured scalar to gpipe's
    validity-gated accumulator — restoring the aux term the TP train path
    gets from `sow` (train/train_step.py::vlm_loss)."""
    n_stages = mesh.shape[axis_name]
    block = DecoderBlock(cfg, use_moe=use_moe)
    per_stage = cfg.depth // n_stages

    def stage_fn(stage_params, x):
        def body(i, h):
            layer_params = jax.tree_util.tree_map(lambda p: p[i], stage_params)
            with plain_partitioning():
                return block.apply({"params": layer_params}, h)

        return jax.lax.fori_loop(0, per_stage, body, x)

    def stage_fn_aux(stage_params, x):
        def body(i, carry):
            h, aux = carry
            layer_params = jax.tree_util.tree_map(lambda p: p[i], stage_params)
            with plain_partitioning():
                h, mut = block.apply(
                    {"params": layer_params}, h, mutable=["losses"]
                )
            leaves = jax.tree_util.tree_leaves(mut.get("losses", {}))
            for a in leaves:
                aux = aux + jnp.mean(a.astype(jnp.float32))
            return h, aux

        aux0 = jnp.zeros((), jnp.float32)
        if n_stages > 1:
            # Only inside the manual (shard_map) pipeline region does the
            # accumulator need varying typing; the 1-stage path runs under
            # plain jit where `axis_name` is not a bound manual axis.
            aux0 = jax.lax.pcast(aux0, (axis_name,), to="varying")
        return jax.lax.fori_loop(0, per_stage, body, (x, aux0))

    stacked = stack_block_params(decoder_params, cfg.depth, n_stages)
    stacked = shard_stacked_params(mesh, stacked, axis_name)
    return gpipe(
        mesh,
        stage_fn_aux if with_aux else stage_fn,
        stacked,
        x_microbatches,
        axis_name=axis_name,
        with_aux=with_aux,
    )

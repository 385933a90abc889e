"""GPipe-style pipeline parallelism over a mesh axis.

The last classic strategy from SURVEY.md §2.5: stage s of the network lives
on mesh coordinate s of `axis_name` (stage-stacked params, leading axis
sharded), and microbatches stream through the ring — each step every stage
processes its resident microbatch and hands the activation to the next
stage via `jax.lax.ppermute` (neighbor-only ICI traffic).  The classic
(M + S - 1)-step schedule: M microbatches fill and drain an S-deep pipeline.

Generic over the stage function, so any shape-preserving stack (transformer
blocks) pipelines without model changes.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpipe(
    mesh: Mesh,
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    microbatches: jnp.ndarray,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Run `microbatches` (M, ...) through S pipeline stages.

    stacked_params: pytree whose leaves have a leading stage axis of size S
    (sharded over `axis_name`).  stage_fn(params_of_one_stage, x) -> y with
    y.shape == x.shape.  Returns (M, ...) outputs, replicated.
    """
    n_stages = mesh.shape[axis_name]
    m = microbatches.shape[0]

    def pipe(params_shard, mb):
        # params_shard leaves: (1, ...) local stage slice; mb: (M, ...) replicated.
        params_local = jax.tree_util.tree_map(lambda x: x[0], params_shard)
        stage = jax.lax.axis_index(axis_name)
        is_first = stage == 0
        is_last = stage == n_stages - 1
        x_shape = mb.shape[1:]
        # The carries hold device-varying data (each stage's resident
        # activations), so their zero-init must be typed varying over the
        # pipeline axis for the vma-checked cond/loop below.
        out0 = jax.lax.pcast(
            jnp.zeros((m,) + x_shape, mb.dtype), (axis_name,), to="varying"
        )
        carry_in0 = jax.lax.pcast(
            jnp.zeros(x_shape, mb.dtype), (axis_name,), to="varying"
        )
        perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]

        def step(t, carry):
            out, x_recv = carry
            # Stage 0 injects microbatch t (when one remains); other stages
            # consume what arrived from the left neighbor last step.
            mb_t = jax.lax.dynamic_index_in_dim(
                mb, jnp.minimum(t, m - 1), keepdims=False
            )
            x_in = jnp.where(is_first, mb_t, x_recv)
            y = stage_fn(params_local, x_in)
            # Last stage commits its finished microbatch (index t-(S-1)).
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(is_last, out_idx >= 0)
            out = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.maximum(out_idx, 0), axis=0
                ),
                lambda o: o,
                out,
            )
            # Hand activations to the next stage.
            x_next = jax.lax.ppermute(y, axis_name, perm)
            return out, x_next

        out, _ = jax.lax.fori_loop(0, m + n_stages - 1, step, (out0, carry_in0))
        # Only the last stage holds real outputs; replicate via psum.
        return jax.lax.psum(
            jnp.where(is_last, out, jnp.zeros_like(out)), axis_name
        )

    param_specs = jax.tree_util.tree_map(
        lambda _: P(axis_name), stacked_params,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
    # Manual ONLY over the pipeline axis: every other mesh axis (data/seq/
    # expert) stays automatic, so jit-level DP sharding of the microbatch
    # batch dim — and the matching psum of replicated-param cotangents in
    # the backward pass — is inserted by XLA.  This is what lets one
    # shard_map region compose PP with DP without hand-written collectives.
    fn = shard_map(
        pipe,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        axis_names=frozenset({axis_name}),
    )
    return fn(stacked_params, microbatches)


def shard_stacked_params(mesh: Mesh, stacked_params: Any, axis_name: str = "model"):
    """device_put stage-stacked params with the leading axis over `axis_name`."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis_name))),
        stacked_params,
    )

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
    with_aux: bool = False,
) -> jnp.ndarray:
    """Run `microbatches` (M, ...) through S pipeline stages.

    stacked_params: pytree whose leaves have a leading stage axis of size S
    (sharded over `axis_name`).  stage_fn(params_of_one_stage, x) -> y with
    y.shape == x.shape.  Returns (M, ...) outputs, replicated.

    with_aux=True: stage_fn returns (y, aux_scalar) instead — e.g. a MoE
    load-balancing term computed inside the stage.  Fill/drain steps run
    the stage on garbage activations, so each stage's aux is accumulated
    ONLY on its valid steps (stage s holds microbatch t-s at loop step t,
    real iff 0 <= t-s < M); the call then returns (outputs, aux) where aux
    = sum over stages of the microbatch-mean stage aux (replicated).
    """
    n_stages = mesh.shape[axis_name]
    m = microbatches.shape[0]

    if n_stages == 1:
        # Degenerate pipeline (single-chip model axis): no stage axis to
        # shard over — and a size-1 manual shard_map trips XLA's SPMD
        # partitioner ("cross-partition allreduce must be in manual mode").
        # Scan the microbatches through the one stage sequentially; the
        # schedule (M + S - 1 = M steps) and the aux semantics (microbatch
        # mean) are identical by construction.
        params0 = jax.tree_util.tree_map(lambda x: x[0], stacked_params)
        if with_aux:
            def body_aux(acc, x):
                y, a = stage_fn(params0, x)
                return acc + a.astype(jnp.float32), y

            aux_acc, ys = jax.lax.scan(
                body_aux, jnp.zeros((), jnp.float32), microbatches
            )
            return ys, aux_acc / m

        def body(carry, x):
            return carry, stage_fn(params0, x)

        _, ys = jax.lax.scan(body, (), microbatches)
        return ys

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
        # pcast in f32, cast after: a sub-32-bit pcast lowers to an
        # identity-computation all-reduce that XLA CPU's AllReducePromotion
        # pass CHECK-fails on (opcode `copy`); bf16 activations (the
        # tiny/base/prod presets) crashed the compiler here.
        carry_in0 = jax.lax.pcast(
            jnp.zeros(x_shape, jnp.float32), (axis_name,), to="varying"
        ).astype(mb.dtype)
        aux0 = jax.lax.pcast(
            jnp.zeros((), jnp.float32), (axis_name,), to="varying"
        )
        perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]

        def step(t, carry):
            out, x_recv, aux_acc = carry
            # Stage 0 injects microbatch t (when one remains); other stages
            # consume what arrived from the left neighbor last step.
            mb_t = jax.lax.dynamic_index_in_dim(
                mb, jnp.minimum(t, m - 1), keepdims=False
            )
            # Cross the invariant->varying boundary in f32: the transpose of
            # this mix is a psum_invariant in mb's dtype, and a bf16 one
            # CHECK-fails XLA CPU's AllReducePromotion pass (layout
            # assignment leaves a ROOT `copy` in the reduction computation,
            # which the pass cannot clone as a binary op).
            mb_t = jax.lax.pcast(
                mb_t.astype(jnp.float32), (axis_name,), to="varying"
            ).astype(mb.dtype)
            x_in = jnp.where(is_first, mb_t, x_recv)
            if with_aux:
                y, aux_t = stage_fn(params_local, x_in)
                # Aux from fill/drain garbage would bias the estimate (and
                # double-count): gate on this stage actually holding a real
                # microbatch at step t.
                aux_valid = jnp.logical_and(t >= stage, t < m + stage)
                aux_acc = aux_acc + jnp.where(
                    aux_valid, aux_t.astype(jnp.float32), 0.0
                )
            else:
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
            return out, x_next, aux_acc

        out, _, aux_acc = jax.lax.fori_loop(
            0, m + n_stages - 1, step, (out0, carry_in0, aux0)
        )
        # Only the last stage holds real outputs; replicate via psum — in
        # f32 (lossless: exactly one non-zero contributor per element), as
        # a bf16 all-reduce here gets cloned by XLA CPU's
        # AllReducePromotion pass into an invalid `copy` binary op and
        # CHECK-fails the compiler.
        out = jax.lax.psum(
            jnp.where(is_last, out, jnp.zeros_like(out)).astype(jnp.float32),
            axis_name,
        ).astype(out.dtype)
        if with_aux:
            # Sum stage contributions (each a per-microbatch sum), then
            # normalize to the microbatch mean — matching the TP loss's
            # whole-batch per-block aux up to microbatch statistics.
            return out, jax.lax.psum(aux_acc, axis_name) / m
        return out

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
        out_specs=(P(), P()) if with_aux else P(),
        axis_names=frozenset({axis_name}),
    )
    return fn(stacked_params, microbatches)


def shard_stacked_params(mesh: Mesh, stacked_params: Any, axis_name: str = "model"):
    """device_put stage-stacked params with the leading axis over `axis_name`."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis_name))),
        stacked_params,
    )

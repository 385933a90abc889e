import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_compression_project_tpu.parallel import MeshConfig, build_mesh
from vision_compression_project_tpu.parallel.pipeline import (
    gpipe,
    shard_stacked_params,
)


@pytest.fixture(scope="module")
def mesh_pp():
    return build_mesh(MeshConfig(data=2, seq=1, expert=1, model=4))


def test_gpipe_matches_sequential(mesh_pp):
    rng = np.random.default_rng(0)
    stages, m, d = 4, 6, 16
    ws = rng.standard_normal((stages, d, d)).astype(np.float32) * 0.3
    bs = rng.standard_normal((stages, d)).astype(np.float32) * 0.1
    mbs = rng.standard_normal((m, 8, d)).astype(np.float32)

    def stage_fn(params, x):
        w, b = params
        return jnp.tanh(x @ w + b)

    params = shard_stacked_params(
        mesh_pp, (jnp.asarray(ws), jnp.asarray(bs)), axis_name="model"
    )
    got = gpipe(mesh_pp, stage_fn, params, jnp.asarray(mbs), axis_name="model")

    want = mbs
    for s in range(stages):
        want = np.tanh(want @ ws[s] + bs[s])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gpipe_single_microbatch(mesh_pp):
    rng = np.random.default_rng(1)
    d = 8
    ws = rng.standard_normal((4, d, d)).astype(np.float32) * 0.2
    mbs = rng.standard_normal((1, 4, d)).astype(np.float32)

    def stage_fn(w, x):
        return x @ w

    params = shard_stacked_params(mesh_pp, jnp.asarray(ws), axis_name="model")
    got = gpipe(mesh_pp, stage_fn, params, jnp.asarray(mbs), axis_name="model")
    want = mbs
    for s in range(4):
        want = want @ ws[s]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_compression_project_tpu.parallel import (
    AXIS_DATA,
    MeshConfig,
    build_mesh,
    distributed_topk,
    ring_all_gather_rows,
)


def test_mesh_shapes(mesh8):
    assert mesh8.shape == {"data": 2, "seq": 1, "expert": 2, "model": 2}


def test_mesh_resolve_infers_data():
    cfg = MeshConfig(data=0, model=2).resolve(8)
    assert cfg.data == 4 and cfg.model == 2


def test_distributed_topk_matches_dense(mesh_dp):
    rng = np.random.default_rng(0)
    scores = rng.standard_normal(1024).astype(np.float32)
    sharded = jax.device_put(
        jnp.asarray(scores), NamedSharding(mesh_dp, P(AXIS_DATA))
    )
    vals, idx = distributed_topk(mesh_dp, sharded, k=7)
    expect_idx = np.argsort(-scores)[:7]
    np.testing.assert_array_equal(np.sort(np.asarray(idx)), np.sort(expect_idx))
    np.testing.assert_allclose(
        np.sort(np.asarray(vals)), np.sort(scores[expect_idx]), rtol=1e-6
    )


def test_ring_all_gather_rows(mesh_dp):
    rows = np.arange(64, dtype=np.float32).reshape(16, 4)
    sharded = jax.device_put(
        jnp.asarray(rows), NamedSharding(mesh_dp, P(AXIS_DATA, None))
    )
    gathered = ring_all_gather_rows(mesh_dp, sharded)
    np.testing.assert_array_equal(np.asarray(gathered), rows)

"""Explicit-collective embedding lookup tests on the 8-device CPU mesh:
forward parity with a dense gather and gradient (scatter) parity through
``jax.grad`` + ``shard_map`` for both exchange strategies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from twotower_tpu.parallel.a2a import sharded_embedding_lookup


@pytest.fixture(scope="module")
def mesh():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(d[:8]), ("model",))


@pytest.fixture(scope="module")
def table_and_ids(mesh):
    rng = np.random.default_rng(0)
    rows, dim = 8 * 16, 8  # 16 rows per shard
    table = jnp.asarray(rng.normal(size=(rows, dim)), jnp.float32)
    table = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids = jnp.asarray(rng.integers(0, rows, 64), jnp.int32)
    return table, ids


@pytest.mark.parametrize("strategy", ["psum", "alltoall"])
class TestShardedLookup:
    def test_forward_matches_dense_gather(self, mesh, table_and_ids, strategy):
        table, ids = table_and_ids
        out = sharded_embedding_lookup(mesh, table, ids, strategy=strategy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(table)[np.asarray(ids)], rtol=1e-6
        )

    def test_duplicate_ids(self, mesh, table_and_ids, strategy):
        table, _ = table_and_ids
        ids = jnp.asarray([3, 3, 3, 77, 127, 0, 0, 64], jnp.int32)
        out = sharded_embedding_lookup(mesh, table, ids, strategy=strategy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(table)[np.asarray(ids)], rtol=1e-6
        )

    def test_gradient_is_scatter_add(self, mesh, table_and_ids, strategy):
        table, ids = table_and_ids

        def loss(t):
            rows = sharded_embedding_lookup(mesh, t, ids, strategy=strategy)
            return jnp.sum(rows * rows)

        def dense_loss(t):
            return jnp.sum(t[ids] * t[ids])

        g = jax.grad(loss)(table)
        g_ref = jax.grad(dense_loss)(table)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5)

    def test_skewed_ownership(self, mesh, table_and_ids, strategy):
        # every id on one shard: worst-case bucket capacity is exercised
        table, _ = table_and_ids
        ids = jnp.asarray(np.full(32, 5), jnp.int32)
        out = sharded_embedding_lookup(mesh, table, ids, strategy=strategy)
        np.testing.assert_allclose(
            np.asarray(out), np.tile(np.asarray(table)[5], (32, 1)), rtol=1e-6
        )

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


class TestLookupOverflowStats:
    def test_dropped_count_surfaced(self, mesh, table_and_ids):
        from jax.experimental.shard_map import shard_map

        from twotower_tpu.parallel.a2a import alltoall_lookup

        table, _ = table_and_ids
        # 6 ids on shard 0 with capacity 4 -> 2 drops; shard-3 id unaffected.
        ids = jnp.asarray([0, 1, 2, 3, 4, 5, 50, 50], jnp.int32)

        def body(t, i):
            return alltoall_lookup(
                t, i, axis_name="model", capacity=4, return_stats=True
            )

        rows, dropped = shard_map(
            body, mesh=mesh, in_specs=(P("model", None), P()),
            out_specs=(P(), P()), check_rep=False,
        )(table, ids)
        assert int(dropped) == 2
        # Ids within capacity and on other shards still resolve correctly.
        np.testing.assert_allclose(
            np.asarray(rows)[-2:], np.asarray(table)[[50, 50]], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(rows)[:4], np.asarray(table)[:4], rtol=1e-6
        )


class TestAllToAllRowUpdate:
    def _dist_update(self, mesh, table, moments, ids, grads, *, capacity=None,
                     step=1, lr=1e-3):
        from jax.experimental.shard_map import shard_map

        from twotower_tpu.parallel.a2a import alltoall_row_update

        def body(t, mo, i, g):
            nt, nmo, nsq, drop = alltoall_row_update(
                t, mo, i, g, axis_name="model", capacity=capacity,
                lr=jnp.float32(lr), step=jnp.int32(step),
            )
            return nt, nmo, jax.lax.psum(nsq, "model"), jax.lax.psum(drop, "model")

        return shard_map(
            body, mesh=mesh,
            in_specs=(P("model", None), P("model", None), P("model"), P("model", None)),
            out_specs=(P("model", None), P("model", None), P(), P()),
            check_rep=False,
        )(table, moments, ids, grads)

    def test_matches_single_device_sparse_update(self, mesh, rng):
        from twotower_tpu.training.sparse import (
            adam_row_update_packed,
            dedup_rows,
        )

        rows, dim = 8 * 16, 8
        table = jnp.asarray(rng.normal(size=(rows, dim)), jnp.float32)
        # nu (second half) must be non-negative — Adam's sqrt contract.
        moments = jnp.asarray(np.abs(rng.normal(size=(rows, 2 * dim))) * 0.01, jnp.float32)
        # 64 ids (8 per device slice), with cross-device duplicates.
        ids = rng.integers(0, rows - 1, 64).astype(np.int32)
        ids[5] = ids[40]  # duplicate across device slices
        ids[8] = ids[9]  # duplicate within a slice
        grads = jnp.asarray(rng.normal(size=(64, dim)), jnp.float32)
        kw = dict(lr=jnp.float32(1e-3), b1=0.9, b2=0.999, eps=1e-8,
                  step=jnp.int32(3))

        targets, summed, valid = dedup_rows(jnp.asarray(ids), grads, rows - 1)
        ref_t, ref_mo = adam_row_update_packed(table, moments, targets, summed, valid, **kw)
        ref_norm = float(jnp.sum(jnp.square(summed) * valid.astype(jnp.float32)[:, None]))

        sh_t = jax.device_put(table, NamedSharding(mesh, P("model", None)))
        sh_mo = jax.device_put(moments, NamedSharding(mesh, P("model", None)))
        new_t, new_mo, norm_sq, dropped = self._dist_update(
            mesh, sh_t, sh_mo, jnp.asarray(ids), grads, step=3
        )
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(new_t), np.asarray(ref_t), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_mo), np.asarray(ref_mo), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(norm_sq), ref_norm, rtol=1e-5)

    def test_overflow_drops_counted_and_harmless(self, mesh, rng):
        rows, dim = 8 * 16, 8
        table = jnp.asarray(rng.normal(size=(rows, dim)), jnp.float32)
        moments = jnp.zeros((rows, 2 * dim), jnp.float32)
        # Every device sends all 8 of its ids to shard 0 (ids < 16): with
        # capacity 4, each device drops 4; rows on other shards untouched.
        ids = jnp.asarray(np.tile(np.arange(8), 8), jnp.int32)
        grads = jnp.asarray(rng.normal(size=(64, dim)), jnp.float32)
        sh_t = jax.device_put(table, NamedSharding(mesh, P("model", None)))
        sh_mo = jax.device_put(moments, NamedSharding(mesh, P("model", None)))
        new_t, _, _, dropped = self._dist_update(
            mesh, sh_t, sh_mo, ids, grads, capacity=4
        )
        assert int(dropped) == 8 * 4
        # Rows outside shard 0 were never targeted and must be bit-identical.
        np.testing.assert_array_equal(np.asarray(new_t)[16:], np.asarray(table)[16:])

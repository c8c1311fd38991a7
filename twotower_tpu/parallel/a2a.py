"""Explicit-collective lookups into row-sharded embedding tables.

The GSPMD path (parallel/spmd.py) lets XLA derive the collectives for
``table[ids]`` from sharding annotations. This module is the hand-written
equivalent for use inside ``shard_map`` — the BASELINE north star's
"all-to-all ID exchange and gradient scatter" — with two strategies:

- ``psum_lookup``: every shard gathers the ids it owns (masked) and the
  partial rows are summed over the model axis. Simple; moves ``B x E``
  per link — the same pattern GSPMD emits.
- ``alltoall_lookup``: ids are bucketed by owner shard (sort + static-shape
  capacity), exchanged with ``all_to_all``, gathered locally, and the rows
  returned with a second ``all_to_all``. Traffic is ``S x capacity x E``
  per device: at the safe default ``capacity=B`` (worst-case skew) that is
  MORE than psum's ``~2 x B x E`` — the saving only materializes with
  ``capacity ~ B/S`` (uniform ownership, e.g. shuffled batches), where it
  is ``~B x E`` total. Callers who can bound per-shard ownership should
  pass the tighter capacity; ids beyond a bucket's capacity would be
  silently dropped, so the default stays worst-case-safe.

Both are plain differentiable JAX: the transpose of the exchange IS the
gradient scatter (``all_to_all`` back + segment scatter-add), so ``jax.grad``
through a ``shard_map``-wrapped lookup produces the distributed backward
automatically (golden-tested against the dense gather on the CPU mesh).

Row layout contract: global id ``g`` lives on shard ``g // rows_per_shard``
at local row ``g % rows_per_shard`` — matching
``data/vocab.py::shard_bounds`` and a ``P("model", None)`` NamedSharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def psum_lookup(table_shard: Array, ids: Array, *, axis_name: str) -> Array:
    """Masked local gather + all-reduce over the model axis.

    Args:
      table_shard: ``[rows_per_shard, E]`` this device's rows.
      ids: ``[B]`` global row ids (replicated across the model axis).
    Returns:
      ``[B, E]`` gathered rows (replicated across the model axis).
    """
    rows_per_shard = table_shard.shape[0]
    s = jax.lax.axis_index(axis_name)
    local = ids - s * rows_per_shard
    owned = (local >= 0) & (local < rows_per_shard)
    rows = table_shard[jnp.clip(local, 0, rows_per_shard - 1)]
    rows = jnp.where(owned[:, None], rows, 0.0)
    return jax.lax.psum(rows, axis_name)


def alltoall_lookup(
    table_shard: Array,
    ids: Array,
    *,
    axis_name: str,
    capacity: int | None = None,
) -> Array:
    """Bucketed all-to-all exchange: send each id to its owner shard, get the
    row back. ``capacity`` is the per-destination bucket size (default: the
    worst-case ``B``; see module docstring for the traffic trade-off —
    ownership counts beyond capacity are silently dropped, so only lower it
    when ownership is provably bounded).
    """
    rows_per_shard = table_shard.shape[0]
    num_shards = jax.lax.axis_size(axis_name)
    my_shard = jax.lax.axis_index(axis_name)
    b = ids.shape[0]
    cap = b if capacity is None else capacity

    owner = jnp.clip(ids // rows_per_shard, 0, num_shards - 1)
    order = jnp.argsort(owner)  # stable group-by-owner
    sorted_ids = ids[order]
    sorted_owner = owner[order]
    # Start offset of each owner bucket and position within it.
    starts = jnp.searchsorted(sorted_owner, jnp.arange(num_shards))
    bucket_pos = jnp.arange(b) - starts[sorted_owner]

    # Static-capacity send buffer [S, cap]: row s holds the ids bound for
    # shard s; padding entries point at shard s's row 0 (always in-bounds).
    pad_ids = (jnp.arange(num_shards) * rows_per_shard)[:, None] * jnp.ones(
        (1, cap), jnp.int32
    )
    send_ids = pad_ids.astype(ids.dtype).at[
        sorted_owner, jnp.minimum(bucket_pos, cap - 1)
    ].set(sorted_ids)

    # Exchange requests: recv_ids[j] = the ids device j wants from MY shard.
    recv_ids = jax.lax.all_to_all(
        send_ids, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    local = jnp.clip(recv_ids - my_shard * rows_per_shard, 0, rows_per_shard - 1)
    rows = table_shard[local]  # [S, cap, E]

    # Return the rows: resp[j] = rows for the ids I sent to shard j.
    resp = jax.lax.all_to_all(rows, axis_name, split_axis=0, concat_axis=0, tiled=False)

    # Un-bucket: my p-th sorted request went to bucket sorted_owner[p] at
    # bucket_pos[p]; then invert the sort.
    flat = resp.reshape(num_shards * cap, -1)
    emb_sorted = flat[sorted_owner * cap + jnp.minimum(bucket_pos, cap - 1)]
    inverse = jnp.argsort(order)
    return emb_sorted[inverse]


def sharded_embedding_lookup(
    mesh,
    table: Array,
    ids: Array,
    *,
    model_axis: str = "model",
    strategy: str = "alltoall",
) -> Array:
    """Convenience wrapper: run a lookup strategy under ``shard_map`` on a
    table sharded ``P(model_axis, None)`` with replicated ids."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    fn = alltoall_lookup if strategy == "alltoall" else psum_lookup

    return shard_map(
        lambda t, i: fn(t, i, axis_name=model_axis),
        mesh=mesh,
        in_specs=(P(model_axis, None), P()),
        out_specs=P(),
        check_rep=False,
    )(table, ids)

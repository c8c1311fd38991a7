"""Explicit-collective lookups into row-sharded embedding tables.

The GSPMD path (parallel/spmd.py) lets XLA derive the collectives for
``table[ids]`` from sharding annotations. This module is the hand-written
equivalent for use inside ``shard_map`` — the BASELINE north star's
"all-to-all ID exchange and gradient scatter" — with two strategies:

- ``psum_lookup``: every shard gathers the ids it owns (masked) and the
  partial rows are summed over the model axis. Simple; moves ``B x E``
  per link — the same pattern GSPMD emits.
- ``alltoall_lookup``: ids are bucketed by owner shard (sort + static-shape
  capacity, duplicate ids DEDUPLICATED into one slot), exchanged with
  ``all_to_all``, gathered locally, and the rows returned with a second
  ``all_to_all``. Traffic is ``S x capacity x E`` per device: at the safe
  default ``capacity=B`` (worst-case skew) that is MORE than psum's
  ``~2 x B x E`` — the saving only materializes with ``capacity ~ B/S``
  (uniform ownership of the UNIQUE ids; duplicates are free, so zipf-hot
  items do not consume capacity), where it is ``~B x E`` total. Callers
  who can bound per-shard unique-id counts should pass the tighter
  capacity (``mesh.a2a_capacity_factor``; the flagship presets ship one);
  ids beyond a bucket's capacity fall into a trash bucket (they read/write
  nothing real, and ``return_stats=True`` reports the count) — the default
  capacity stays worst-case-safe. PARITY.md records the measured
  step-time/traffic comparison.

``alltoall_row_update`` is the lookup's explicit transpose for the sparse
training path: route row grads to owners, dedup there, lazy-Adam the local
shard rows (the BASELINE "gradient scatter").

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


def _bucket_by_owner(ids: Array, rows_per_shard: int, num_shards: int, cap: int):
    """Group-by-owner with static-capacity buckets, DEDUPLICATED slots.

    Duplicate ids share one slot (sorting by id groups duplicates adjacently
    and makes owners monotonic at once), so capacity bounds the UNIQUE ids
    per owner — a hot item repeated hundreds of times in a batch consumes
    one slot, not hundreds. This is what lets the flagship presets run tight
    ``a2a_capacity_factor`` values with zero drops on realistic zipf-skewed
    batches (tests/test_sparse_spmd.py).

    Returns ``(sorted_ids, sorted_owner, dest, slot, order, bucket_pos,
    dropped)``: ``dest``/``slot`` address a ``[num_shards + 1, cap]`` send
    buffer where bucket ``num_shards`` is the trash row for overflow entries
    (so an overflowing bucket can never clobber another id's valid slot),
    ``bucket_pos`` is each entry's unique-id position within its owner's
    bucket (pre-clamp; duplicates share their first occurrence's position),
    and ``dropped`` counts entries beyond capacity.
    """
    b = ids.shape[0]
    owner = jnp.clip(ids // rows_per_shard, 0, num_shards - 1)
    order = jnp.argsort(ids)  # owner-monotonic AND duplicates adjacent
    sorted_ids = ids[order]
    sorted_owner = owner[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    urank = jnp.cumsum(first) - 1  # unique rank; duplicates share it
    starts = jnp.searchsorted(sorted_owner, jnp.arange(num_shards))
    start_urank = urank[jnp.clip(starts, 0, b - 1)]
    bucket_pos = urank - start_urank[sorted_owner]
    overflow = bucket_pos >= cap
    dest = jnp.where(overflow, num_shards, sorted_owner)
    slot = jnp.minimum(bucket_pos, cap - 1)
    dropped = jnp.sum(overflow.astype(jnp.int32))
    return sorted_ids, sorted_owner, dest, slot, order, bucket_pos, dropped


def alltoall_lookup(
    table_shard: Array,
    ids: Array,
    *,
    axis_name,
    capacity: int | None = None,
    return_stats: bool = False,
):
    """Bucketed all-to-all exchange: send each id to its owner shard, get the
    row back. ``capacity`` is the per-destination bucket size (default: the
    worst-case ``B``; see module docstring for the traffic trade-off).
    Ids beyond a bucket's capacity receive arbitrary rows (their requests
    land in a trash bucket, so other ids stay correct); pass
    ``return_stats=True`` to get ``(rows, dropped_count)`` so callers can
    surface overflow instead of silently training on corrupt rows.
    """
    rows_per_shard = table_shard.shape[0]
    num_shards = jax.lax.axis_size(axis_name)
    my_shard = jax.lax.axis_index(axis_name)
    b = ids.shape[0]
    cap = b if capacity is None else min(capacity, b)

    sorted_ids, sorted_owner, dest, slot, order, bucket_pos, dropped = (
        _bucket_by_owner(ids, rows_per_shard, num_shards, cap)
    )

    # Static-capacity send buffer [S+1, cap] (last row = overflow trash):
    # row s holds the ids bound for shard s; padding entries point at shard
    # s's row 0 (always in-bounds on the owner).
    pad_ids = (jnp.arange(num_shards + 1) * rows_per_shard)[:, None] * jnp.ones(
        (1, cap), jnp.int32
    )
    send_ids = pad_ids.astype(ids.dtype).at[dest, slot].set(sorted_ids)[:num_shards]

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
    out = emb_sorted[inverse]
    if return_stats:
        return out, dropped
    return out


def alltoall_row_update(
    table_shard: Array,
    moments_shard: Array,
    ids: Array,
    grads: Array,
    *,
    axis_name,
    capacity: int | None = None,
    lr: Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    step: Array,
) -> tuple[Array, Array, Array, Array]:
    """Distributed "gradient scatter": route row gradients to their owner
    shards with all-to-all, dedup at the owner, and apply the packed
    lazy-Adam row update (``training.sparse.adam_row_update_packed``) to the
    local table shard.

    This is the hand-written transpose of ``alltoall_lookup`` — together
    they form the BASELINE north star's "all-to-all ID exchange and gradient
    scatter" for the sharded sparse train step (parallel/sparse_spmd.py).
    Each device contributes its ``(ids, grads)`` exactly once; contributions
    for the same global row from different devices are summed at the owner
    (dedup is a sort + segment-sum over the received buckets, same static-
    shape scheme as the single-device ``dedup_rows``).

    Args:
      table_shard: ``[rows_per_shard, E]`` this device's table rows.
      moments_shard: ``[rows_per_shard, 2E]`` packed Adam moments.
      ids: ``[R]`` global row ids this device is responsible for reporting.
      grads: ``[R, E]`` the matching row gradients.
      capacity: per-destination bucket size (default worst-case ``R`` —
        zero drops). Overflow entries land in a trash bucket (never
        corrupting other rows) and are counted in the returned drop count.

    Returns:
      ``(new_table_shard, new_moments_shard, grad_norm_sq, dropped)`` where
      ``grad_norm_sq`` is this shard's contribution to the global table-grad
      norm (sum over the deduped row grads; psum it over the row axis).
    """
    from twotower_tpu.training.sparse import adam_row_update_packed

    rows_per_shard = table_shard.shape[0]
    num_shards = jax.lax.axis_size(axis_name)
    my_shard = jax.lax.axis_index(axis_name)
    r, e = grads.shape
    cap = r if capacity is None else min(capacity, r)

    sorted_ids, _, dest, slot, order, _, dropped = _bucket_by_owner(
        ids, rows_per_shard, num_shards, cap
    )
    sorted_grads = grads[order]

    # Send buffers: ids pad with -1 (invalid marker), grads pad with zeros;
    # bucket num_shards is the overflow trash row, sliced off before the
    # exchange.
    send_ids = (
        jnp.full((num_shards + 1, cap), -1, jnp.int32)
        .at[dest, slot]
        .set(sorted_ids.astype(jnp.int32))[:num_shards]
    )
    # .add, not .set: duplicate ids share a slot (dedup-before-exchange), so
    # their gradients pre-combine locally — the owner-side segment-sum then
    # only has to merge cross-device contributions.
    send_grads = (
        jnp.zeros((num_shards + 1, cap, e), jnp.float32)
        .at[dest, slot]
        .add(sorted_grads.astype(jnp.float32))[:num_shards]
    )

    recv_ids = jax.lax.all_to_all(
        send_ids, axis_name, split_axis=0, concat_axis=0, tiled=False
    ).reshape(num_shards * cap)
    recv_grads = jax.lax.all_to_all(
        send_grads, axis_name, split_axis=0, concat_axis=0, tiled=False
    ).reshape(num_shards * cap, e)

    # Owner-side dedup: sort by local row, segment-sum. Invalid entries
    # (padding, id -1) sort last under the sentinel ``rows_per_shard``.
    valid_in = recv_ids >= 0
    local = jnp.where(
        valid_in,
        jnp.clip(recv_ids - my_shard * rows_per_shard, 0, rows_per_shard - 1),
        rows_per_shard,
    )
    g_in = recv_grads * valid_in[:, None].astype(jnp.float32)
    n = local.shape[0]
    order2 = jnp.argsort(local)
    s_lid = local[order2]
    s_g = g_in[order2]
    first = jnp.concatenate([jnp.ones((1,), bool), s_lid[1:] != s_lid[:-1]])
    seg = jnp.cumsum(first) - 1
    summed = jax.ops.segment_sum(s_g, seg, num_segments=n)
    seg_ids = jax.ops.segment_max(s_lid, seg, num_segments=n)
    counts = jax.ops.segment_sum(jnp.ones_like(s_lid), seg, num_segments=n)
    valid = (counts > 0) & (seg_ids < rows_per_shard)
    targets = jnp.where(valid, jnp.clip(seg_ids, 0, rows_per_shard - 1), 0)

    new_table, new_moments = adam_row_update_packed(
        table_shard,
        moments_shard,
        targets,
        summed,
        valid,
        lr=lr,
        b1=b1,
        b2=b2,
        eps=eps,
        step=step,
    )
    norm_sq = jnp.sum(jnp.square(summed) * valid.astype(jnp.float32)[:, None])
    return new_table, new_moments, norm_sq, dropped


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

"""Sharding rules: which pytree leaves live where on the mesh.

Layout (BASELINE.json north star; no reference analog — SURVEY.md §2.2
rows 19/22):

- Embedding tables (``user_embedding`` / ``item_embedding`` and their Adam
  moment mirrors): **row-sharded over the ``model`` axis** — the tables are
  the memory giants (10M+ items x 128+ dims), everything else is KBs.
- Dense tower params + scalars: replicated.
- Batches: sharded over the ``data`` axis.

Leaves are matched *by tree path* (any path segment naming an embedding
table), which transparently covers optimizer states that mirror the param
tree structure (optax Adam's ``mu``/``nu``).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from twotower_tpu.config import MeshConfig

_TABLE_NAMES = ("user_embedding", "item_embedding", "text_embedding")


def _path_names(path: tuple) -> list[str]:
    out = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "name", None)
        if key is not None:
            out.append(str(key))
    return out


def _is_table_leaf(path: tuple, leaf: Any) -> bool:
    names = _path_names(path)
    return any(t in names for t in _TABLE_NAMES) and getattr(leaf, "ndim", 0) == 2


def table_partition(config: MeshConfig, *, sparse_mesh: bool = False) -> P:
    """Row-sharding spec for embedding tables (and their moment mirrors).

    Dense GSPMD path: rows over the ``model`` axis only (replicated across
    ``data`` so XLA's auto-partitioned gather works without redundancy
    bookkeeping). Sparse a2a path (parallel/sparse_spmd.py): rows over the
    COMBINED ``(data, model)`` axis — every device owns distinct rows, which
    both maximizes table capacity and makes the distributed row scatter
    consistency-free.
    """
    if not config.shard_embeddings:
        return P(None, None)
    if sparse_mesh:
        return P((config.data_axis, config.model_axis), None)
    return P(config.model_axis, None)


def state_pspecs(state: Any, config: MeshConfig, *, sparse_mesh: bool = False) -> Any:
    """PartitionSpec tree for a TrainState (or bare params) pytree."""
    table = table_partition(config, sparse_mesh=sparse_mesh)

    def rule(path, leaf):
        return table if _is_table_leaf(path, leaf) else P()

    return jax.tree_util.tree_map_with_path(rule, state)


def state_shardings(
    mesh: Mesh, state: Any, config: MeshConfig, *, sparse_mesh: bool = False
) -> Any:
    """NamedSharding tree for a TrainState (or bare params) pytree."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        state_pspecs(state, config, sparse_mesh=sparse_mesh),
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_shardings(mesh: Mesh, config: MeshConfig) -> Any:
    """Batch dict sharding: every array splits along the data axis."""
    return NamedSharding(mesh, P(config.data_axis))


def process_row_spans(sharding: Any, global_rows: int) -> list[tuple[int, int]]:
    """Ascending ``[lo, hi)`` spans of batch rows THIS process must supply.

    ``jax.make_array_from_process_local_data`` maps the process-local array
    onto the union of the process's addressable global slices in ascending
    order (replica devices must be fed identical data). Deriving the spans
    from the sharding itself — instead of assuming process ``p`` owns the
    contiguous ``[p*B/P, (p+1)*B/P)`` slice — stays correct on topologies
    where a data shard's model-replica group spans hosts (e.g. num_model
    larger than the per-host device count)."""
    idx_map = sharding.addressable_devices_indices_map((global_rows,))
    spans = sorted(
        {
            (
                (idx[0].start or 0),
                global_rows if idx[0].stop is None else idx[0].stop,
            )
            for idx in idx_map.values()
        }
    )
    for (_, a_hi), (b_lo, _) in zip(spans, spans[1:]):
        if b_lo < a_hi:
            raise ValueError(
                f"non-uniform batch sharding: overlapping row spans {spans}"
            )
    return spans


def shard_state(
    mesh: Mesh, state: Any, config: MeshConfig, *, sparse_mesh: bool = False
) -> Any:
    """Place a host-resident state pytree onto the mesh per the rules."""
    return jax.device_put(
        state, state_shardings(mesh, state, config, sparse_mesh=sparse_mesh)
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

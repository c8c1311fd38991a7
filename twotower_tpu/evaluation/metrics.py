"""Retrieval metrics: Recall@K and NDCG@K.

Realizes the reference's declared evaluation surface (reference:
pyproject.toml:69; configs/data_config.yaml:71 ``top_k_eval:
[1,5,10,20,50,100]``; README.md:80 reports Recall@10 / NDCG@10). Computed
on-device from top-k index lists — single-positive protocol (each eval row
holds one held-out item), under which NDCG@K reduces to 1/log2(rank+2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rank_of_true_item(topk_idx: Array, true_item: Array) -> Array:
    """Position (0-based) of the true item in each top-k list; ``k`` if absent.

    Args:
      topk_idx: ``[B, k]`` retrieved item ids, best first.
      true_item: ``[B]`` held-out positive ids.
    """
    k = topk_idx.shape[1]
    hits = topk_idx == true_item[:, None]
    pos = jnp.argmax(hits, axis=1)
    return jnp.where(hits.any(axis=1), pos, k)


def metrics_at_k(
    topk_idx: Array,
    true_item: Array,
    ks: tuple[int, ...],
    *,
    weights: Array | None = None,
) -> dict[str, Array]:
    """Recall@K and NDCG@K for every K in ``ks`` from one ``[B, max_k]``
    retrieval; returns scalars averaged over (weighted) rows."""
    if max(ks) > topk_idx.shape[1]:
        raise ValueError(f"max k {max(ks)} exceeds retrieved {topk_idx.shape[1]}")
    rank = rank_of_true_item(topk_idx, true_item)
    if weights is None:
        weights = jnp.ones(rank.shape, jnp.float32)
    weights = weights.astype(jnp.float32)
    denom = jnp.maximum(weights.sum(), 1.0)
    out: dict[str, Array] = {}
    gain = 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0)
    for k in ks:
        hit = (rank < k).astype(jnp.float32)
        out[f"recall@{k}"] = (hit * weights).sum() / denom
        out[f"ndcg@{k}"] = (hit * gain * weights).sum() / denom
    out["mrr"] = (
        (rank < topk_idx.shape[1]).astype(jnp.float32)
        / (rank.astype(jnp.float32) + 1.0)
        * weights
    ).sum() / denom
    return out


def merge_metric_sums(
    batch_metrics: list[dict[str, Array]], batch_weights: list[float]
) -> dict[str, float]:
    """Weighted average of per-batch scalar metrics on host."""
    if not batch_metrics:
        return {}
    total = sum(batch_weights)
    out: dict[str, float] = {}
    for key in batch_metrics[0]:
        out[key] = float(
            sum(float(m[key]) * w for m, w in zip(batch_metrics, batch_weights))
            / max(total, 1e-12)
        )
    return out

"""Retrieval losses: in-batch sampled softmax with log-Q correction.

Capability parity: the reference declares (but never implements) a TFRS
``tfrs.tasks.Retrieval`` in-batch sampled-softmax loss with temperature 0.1
(reference: configs/data_config.yaml:68-70, README.md:16). This module is the
TPU-native realization: one fused ``B x B`` matmul on the MXU followed by a
log-sum-exp — XLA fuses the temperature scale, log-Q subtraction, duplicate
masking, and cross-entropy into the matmul epilogue. A Pallas kernel variant
lives in ``ops/pallas_kernels.py`` for block-wise fusion at large B.

Math (Yi et al. 2019, "Sampling-Bias-Corrected Neural Modeling"):
    s_ij   = <u_i, v_j> / temperature
    s'_ij  = s_ij - log q(item_j)          (log-Q correction, all columns)
    mask   s'_ij = -inf  where item_j == item_i, j != i  (accidental hits)
    loss   = -mean_i w_i * log softmax(s'_i)_i / mean_i w_i
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1e9  # finite sentinel: keeps grads zero without NaN propagation


def _in_batch_logits(
    user_emb: Array,
    item_emb_all: Array,
    item_idx_all: Array,
    row_offset,
    *,
    temperature: float,
    log_q: Array | None,
    weights_all: Array | None,
) -> tuple[Array, Array, Array, Array]:
    """Shared core of the in-batch and mixed blocks: masked, tempered,
    log-Q-corrected ``[R, B]`` logits. Returns ``(logits, diag, scores,
    row_item)`` — one source of truth for the mask/correction semantics the
    golden and Pallas-parity tests pin down."""
    rows = user_emb.shape[0]
    batch = item_emb_all.shape[0]
    row_offset = jnp.asarray(row_offset, jnp.int32)
    # One MXU matmul; accumulate f32 regardless of input dtype (bf16 path).
    scores = jax.lax.dot_general(
        user_emb,
        item_emb_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = scores / jnp.asarray(temperature, jnp.float32)

    if log_q is not None:
        # Subtract log q(item_j) from column j for every row (bias correction
        # for popular items that appear as in-batch negatives more often).
        logits = logits - log_q[item_idx_all][None, :].astype(jnp.float32)

    col_ids = jnp.arange(batch, dtype=jnp.int32)[None, :]
    row_ids = row_offset + jnp.arange(rows, dtype=jnp.int32)[:, None]
    diag = col_ids == row_ids
    row_item = jax.lax.dynamic_slice_in_dim(item_idx_all, row_offset, rows)
    # Accidental-hit mask: another row's positive equals this row's positive.
    mask = item_idx_all[None, :] == row_item[:, None]
    if weights_all is not None:
        # Zero-weight (padding) columns must not serve as negatives.
        mask = mask | (weights_all[None, :] == 0.0)
    logits = jnp.where(mask & ~diag, _NEG_INF, logits)
    return logits, diag, scores, row_item


def in_batch_softmax_block(
    user_emb: Array,
    item_emb_all: Array,
    item_idx_all: Array,
    row_offset: Array | int,
    *,
    temperature: float = 0.1,
    log_q: Array | None = None,
    weights_all: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Per-row in-batch softmax CE for a row block of the global batch.

    The block form is what every caller reduces to: single-device passes the
    full batch with ``row_offset=0``; the sharded paths (parallel/spmd.py,
    parallel/sparse_spmd.py) pass each data shard's local user rows against
    the all-gathered item columns.

    Args:
      user_emb: ``[R, D]`` query embeddings for global rows
        ``[row_offset, row_offset + R)``.
      item_emb_all: ``[B, D]`` candidate embeddings for the FULL batch.
      item_idx_all: ``[B]`` int32 global item ids for every column.
      row_offset: this block's first global row (static int or traced scalar).
      log_q: optional ``[num_items]`` log sampling probabilities.
      weights_all: optional ``[B]`` per-example weights for every column;
        zero-weight (padding) columns are masked out as negatives so padded
        rows never bias real rows' softmax.

    Returns:
      ``(per_example [R], correct [R], raw_diag [R])`` — CE loss, top-1
      indicator, and the raw (untempered, un-corrected) positive score.
    """
    logits, diag, scores, _ = _in_batch_logits(
        user_emb,
        item_emb_all,
        item_idx_all,
        row_offset,
        temperature=temperature,
        log_q=log_q,
        weights_all=weights_all,
    )
    lse = jax.nn.logsumexp(logits, axis=-1)
    pos = jnp.sum(jnp.where(diag, logits, 0.0), axis=-1)
    per_example = lse - pos
    # pos >= row-max: identical tie semantics to the Pallas kernel's metric
    correct = (pos >= jnp.max(logits, axis=-1)).astype(jnp.float32)
    raw_diag = jnp.sum(jnp.where(diag, scores, 0.0), axis=-1)
    return per_example, jax.lax.stop_gradient(correct), jax.lax.stop_gradient(raw_diag)


def in_batch_softmax_loss(
    user_emb: Array,
    item_emb: Array,
    item_idx: Array,
    *,
    temperature: float = 0.1,
    log_q: Array | None = None,
    weights: Array | None = None,
) -> tuple[Array, dict[str, Array]]:
    """In-batch sampled softmax over the ``B x B`` score matrix.

    Args:
      user_emb: ``[B, D]`` query-tower outputs (any float dtype; scores are
        accumulated in float32 on the MXU via ``preferred_element_type``).
      item_emb: ``[B, D]`` candidate-tower outputs for each row's positive.
      item_idx: ``[B]`` int32 global item ids — used for accidental-hit
        masking and log-Q lookup.
      temperature: softmax temperature (reference schema default 0.1,
        configs/data_config.yaml:69).
      log_q: optional ``[num_items]`` log sampling probabilities (from global
        item frequencies — see ``data/vocab.py``). ``None`` disables log-Q
        correction.
      weights: optional ``[B]`` per-example weights (0 = padding row; padded
        rows neither contribute loss nor serve as in-batch negatives).

    Returns:
      (scalar loss, metrics dict with ``accuracy`` — fraction of rows whose
      positive out-scores every in-batch negative — and ``logits_mean``).
    """
    batch = user_emb.shape[0]
    per_example, correct, raw_diag = in_batch_softmax_block(
        user_emb,
        item_emb,
        item_idx,
        0,
        temperature=temperature,
        log_q=log_q,
        weights_all=weights,
    )
    if weights is None:
        weights = jnp.ones((batch,), jnp.float32)
    weights = weights.astype(jnp.float32)
    denom = jnp.maximum(weights.sum(), 1.0)
    loss = (per_example * weights).sum() / denom
    metrics = {
        "accuracy": (correct * weights).sum() / denom,
        "logits_mean": (raw_diag * weights).sum() / denom,
    }
    return loss, metrics


def l2_penalty(tower_params, gathered_embeddings: list[Array]) -> Array:
    """Sparse-friendly L2 regularization (reference schema
    ``l2_regularization: 1e-6``, configs/data_config.yaml:58).

    Penalizes dense tower kernels plus only the embedding rows *touched this
    step* — a full-table L2 would both waste HBM bandwidth and wrongly decay
    rows that receive no gradient under sparse updates.
    """
    acc = jnp.asarray(0.0, jnp.float32)
    for leaf in jax.tree_util.tree_leaves(tower_params):
        if leaf.ndim >= 2:  # kernels only, not biases
            acc = acc + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    for emb in gathered_embeddings:
        acc = acc + jnp.sum(jnp.square(emb.astype(jnp.float32)))
    return acc


def mixed_softmax_block(
    user_emb: Array,
    item_emb_all: Array,
    item_idx_all: Array,
    row_offset: Array | int,
    neg_emb: Array,
    neg_idx: Array,
    *,
    temperature: float = 0.1,
    log_q: Array | None = None,
    log_uniform: float | None = None,
    weights_all: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Per-row mixed-negative softmax CE for a row block of the global batch.

    Mixed Negative Sampling (Yang et al. 2020, WWW): the candidate set per
    row is the B in-batch items PLUS M shared uniformly-sampled items. The
    in-batch columns over-represent popular items (q = empirical item
    frequency) while the uniform block covers the long tail — each column
    is bias-corrected by the log-probability of ITS OWN sampler (in-batch
    columns: ``log_q[item]``; uniform columns: ``log_uniform`` =
    ``-log(num_items)``). ``log_q=None`` disables both corrections (the
    relative shift between the two blocks matters, so they gate together).

    Same contract as ``in_batch_softmax_block`` otherwise: returns
    ``(per_example [R], correct [R], raw_diag [R])``; the positive is the
    in-batch diagonal; accidental hits (another column equal to the row's
    positive) are masked in BOTH blocks.
    """
    if log_q is not None and log_uniform is None:
        raise ValueError(
            "mixed log-Q correction needs log_uniform (-log(num_items)): "
            "uniform columns were sampled uniformly, not by frequency"
        )
    logits, diag, scores, row_item = _in_batch_logits(
        user_emb,
        item_emb_all,
        item_idx_all,
        row_offset,
        temperature=temperature,
        log_q=log_q,
        weights_all=weights_all,
    )
    neg_logits = jax.lax.dot_general(
        user_emb,
        neg_emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.asarray(temperature, jnp.float32)
    if log_q is not None:
        neg_logits = neg_logits - jnp.asarray(log_uniform, jnp.float32)
    # Uniform block: a sampled negative equal to the row's positive is an
    # accidental hit too.
    neg_hit = neg_idx[None, :] == row_item[:, None]
    neg_logits = jnp.where(neg_hit, _NEG_INF, neg_logits)

    all_logits = jnp.concatenate([logits, neg_logits], axis=1)
    lse = jax.nn.logsumexp(all_logits, axis=-1)
    pos = jnp.sum(jnp.where(diag, logits, 0.0), axis=-1)
    per_example = lse - pos
    correct = (pos >= jnp.max(all_logits, axis=-1)).astype(jnp.float32)
    raw_diag = jnp.sum(jnp.where(diag, scores, 0.0), axis=-1)
    return per_example, jax.lax.stop_gradient(correct), jax.lax.stop_gradient(raw_diag)


def mixed_sampled_softmax_loss(
    user_emb: Array,
    item_emb: Array,
    item_idx: Array,
    neg_item_emb: Array,
    neg_idx: Array,
    *,
    temperature: float = 0.1,
    log_q: Array | None = None,
    num_items: int | None = None,
    weights: Array | None = None,
) -> tuple[Array, dict[str, Array]]:
    """Mixed-negative sampled softmax over ``[B, B + M]`` logits
    (``retrieval.candidate_sampling: "mixed"``): in-batch negatives with
    log-Q correction plus ``M`` shared uniform negatives corrected by
    ``-log(num_items)`` — the production hybrid that keeps the popularity
    signal of in-batch sampling while covering the long tail the batch
    never shows (Yang et al. 2020).
    """
    if log_q is not None and not num_items:
        raise ValueError("mixed sampling with log_q needs num_items")
    batch = user_emb.shape[0]
    per_example, correct, raw_diag = mixed_softmax_block(
        user_emb,
        item_emb,
        item_idx,
        0,
        neg_item_emb,
        neg_idx,
        temperature=temperature,
        log_q=log_q,
        log_uniform=(-math.log(num_items) if num_items else None),
        weights_all=weights,
    )
    if weights is None:
        weights = jnp.ones((batch,), jnp.float32)
    weights = weights.astype(jnp.float32)
    denom = jnp.maximum(weights.sum(), 1.0)
    loss = (per_example * weights).sum() / denom
    metrics = {
        "accuracy": (correct * weights).sum() / denom,
        "logits_mean": (raw_diag * weights).sum() / denom,
    }
    return loss, metrics


def uniform_softmax_block(
    user_emb: Array,
    pos_item_emb: Array,
    neg_item_emb: Array,
    pos_idx: Array | None = None,
    neg_idx: Array | None = None,
    *,
    temperature: float = 0.1,
) -> tuple[Array, Array, Array]:
    """Per-row uniform-negative softmax CE for a row block of the batch.

    The block form the sharded sparse step consumes (the uniform analog of
    ``in_batch_softmax_block``): purely LOCAL — each row scores only its own
    positive against the shared ``[N, D]`` negatives, so the distributed
    step needs no item-column all_gather at all. Returns
    ``(per_example [R], correct [R], raw_diag [R])`` with the same contract
    as the other blocks (``raw_diag`` = raw positive score).
    """
    pos = jnp.einsum("bd,bd->b", user_emb, pos_item_emb).astype(jnp.float32)
    neg = jax.lax.dot_general(
        user_emb,
        neg_item_emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if pos_idx is not None and neg_idx is not None:
        hit = neg_idx[None, :] == pos_idx[:, None]
        neg = jnp.where(hit, _NEG_INF, neg)
    logits = jnp.concatenate([pos[:, None], neg], axis=1) / jnp.asarray(
        temperature, jnp.float32
    )
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    per_example = -log_probs[:, 0]
    correct = (jnp.argmax(logits, axis=-1) == 0).astype(jnp.float32)
    return (
        per_example,
        jax.lax.stop_gradient(correct),
        jax.lax.stop_gradient(pos),
    )


def uniform_sampled_softmax_loss(
    user_emb: Array,
    pos_item_emb: Array,
    neg_item_emb: Array,
    *,
    temperature: float = 0.1,
    weights: Array | None = None,
    pos_idx: Array | None = None,
    neg_idx: Array | None = None,
) -> tuple[Array, dict[str, Array]]:
    """Uniform-negative sampled softmax (``retrieval.candidate_sampling:
    "uniform"`` config branch, configs/data_config.yaml:68).

    ``neg_item_emb`` is ``[N, D]`` shared negatives for the whole batch
    (uniform q => log-Q correction is a constant shift, hence omitted).
    When ``pos_idx``/``neg_idx`` are given, accidental hits (a sampled
    negative equal to the row's positive) are masked out.
    """
    batch = user_emb.shape[0]
    per_example, correct, raw_pos = uniform_softmax_block(
        user_emb,
        pos_item_emb,
        neg_item_emb,
        pos_idx,
        neg_idx,
        temperature=temperature,
    )
    if weights is None:
        weights = jnp.ones((batch,), jnp.float32)
    weights = weights.astype(jnp.float32)
    denom = jnp.maximum(weights.sum(), 1.0)
    loss = (per_example * weights).sum() / denom
    return loss, {
        "accuracy": (correct * weights).sum() / denom,
        "logits_mean": (raw_pos * weights).sum() / denom,
    }

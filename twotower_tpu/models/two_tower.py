"""Two-tower retrieval model: embedding tables + dual MLP towers.

Capability parity with the reference's declared-but-absent model layer
(reference: README.md:16,52; configs/data_config.yaml:54-60 — embedding_dim
128, towers [512,256,128], dropout 0.1, L2 1e-6; the reference planned a TFRS
``tfrs.Model``). TPU-native design decisions:

- **Plain pytree params, pure functions.** Params are nested dicts of
  ``jax.Array`` — trivially annotated with ``NamedSharding`` per leaf for
  GSPMD (``parallel/sharding.py``), trivially swapped under ``jax.grad`` /
  ``optax``, and friendly to Pallas kernels that want raw table refs.
- **bf16 compute, f32 params.** Dense matmuls and the score matmul run in
  ``model.compute_dtype`` (default bfloat16) with float32 MXU accumulation
  via ``preferred_element_type``; the master params stay float32.
- **Static shapes everywhere**: table sizes are padded to lane multiples so
  every shard is equal-sized (see ``data/vocab.py``'s sharding manifest).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from twotower_tpu.config import ModelConfig

Array = jax.Array
Params = dict[str, Any]

LANE = 128  # TPU lane width: pad table rows so shards tile cleanly.


def padded_rows(n: int, multiple: int = LANE) -> int:
    """Table rows padded to a lane multiple with AT LEAST one spare row —
    the last padded row is the ``dead row`` scatter target that sparse
    updates aim duplicate/invalid ids at (training/sparse.py)."""
    return -(-(max(n, 1) + 1) // multiple) * multiple


def dead_row(table: Array) -> int:
    """Index of the guaranteed-unused padding row (never a real id)."""
    return table.shape[0] - 1


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_tower(rng: Array, in_dim: int, dims: list[int]) -> list[Params]:
    """He-initialized MLP stack (relu hidden activations)."""
    layers = []
    for out_dim in dims:
        rng, k = jax.random.split(rng)
        scale = jnp.sqrt(2.0 / in_dim)
        layers.append(
            {
                "kernel": jax.random.normal(k, (in_dim, out_dim), jnp.float32) * scale,
                "bias": jnp.zeros((out_dim,), jnp.float32),
            }
        )
        in_dim = out_dim
    return layers


def init_params(
    rng: Array,
    config: ModelConfig,
    num_users: int,
    num_items: int,
    *,
    pad_multiple: int = LANE,
    text_embedding_init: Array | None = None,
) -> Params:
    """Build the parameter pytree.

    Table row counts are padded up to ``pad_multiple`` so a model-parallel
    mesh axis divides them evenly; padding rows are inert (never gathered —
    ids are dense in ``[0, num_users/items)`` by vocab construction).

    ``text_embedding_init``: optional pre-padded ``[padded_rows(
    text_buckets), embedding_dim]`` initial text table (e.g. pretrained
    word embeddings, features/transformer_encoder.py) used in place of the
    random init.
    """
    k_ue, k_ie, k_ut, k_it, k_tx = jax.random.split(rng, 5)
    e = config.embedding_dim
    scale = 1.0 / jnp.sqrt(e)
    params = {
        "user_embedding": jax.random.normal(
            k_ue, (padded_rows(num_users, pad_multiple), e), jnp.float32
        )
        * scale,
        "item_embedding": jax.random.normal(
            k_ie, (padded_rows(num_items, pad_multiple), e), jnp.float32
        )
        * scale,
        "user_tower": _init_tower(k_ut, e, list(config.user_tower_dims)),
        "item_tower": _init_tower(k_it, e, list(config.item_tower_dims)),
    }
    if config.text_buckets > 0:
        rows = padded_rows(config.text_buckets, pad_multiple)
        if text_embedding_init is not None:
            init = jnp.asarray(text_embedding_init, jnp.float32)
            if init.shape != (rows, e):
                raise ValueError(
                    f"text_embedding_init shape {init.shape} != ({rows}, {e})"
                )
            params["text_embedding"] = init
        else:
            # Token bucket table; row 0 is the PAD bucket (masked out).
            params["text_embedding"] = (
                jax.random.normal(k_tx, (rows, e), jnp.float32) * scale
            )
    return params


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _apply_tower(
    layers: list[Params],
    x: Array,
    *,
    compute_dtype: Any,
    dropout_rate: float,
    dropout_rng: Array | None,
) -> Array:
    """MLP tower: relu between layers, linear output, inverted dropout."""
    x = x.astype(compute_dtype)
    n = len(layers)
    for i, layer in enumerate(layers):
        x = (
            jax.lax.dot_general(
                x,
                layer["kernel"].astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + layer["bias"]
        )
        if i < n - 1:
            x = jax.nn.relu(x)
            if dropout_rate > 0.0 and dropout_rng is not None:
                dropout_rng = jax.random.fold_in(dropout_rng, i)
                keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, x.shape)
                x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
            x = x.astype(compute_dtype)
    return x  # f32 out of the last matmul accumulation


def _maybe_normalize(x: Array, normalize: bool) -> Array:
    if not normalize:
        return x
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-12)


def apply_user_tower(
    params: Params,
    emb: Array,
    config: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Array | None = None,
) -> Array:
    """Query-tower MLP over pre-gathered embedding rows (the sparse-update
    training path differentiates w.r.t. ``emb`` directly)."""
    out = _apply_tower(
        params["user_tower"],
        emb,
        compute_dtype=jnp.dtype(config.compute_dtype),
        dropout_rate=config.dropout_rate if train else 0.0,
        dropout_rng=dropout_rng,
    )
    return _maybe_normalize(out, config.normalize_embeddings)


def embed_users(
    params: Params,
    user_idx: Array,
    config: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Array | None = None,
) -> Array:
    """Query tower: table gather -> MLP -> optional L2 normalize."""
    emb = params["user_embedding"][user_idx]
    return apply_user_tower(
        params, emb, config, train=train, dropout_rng=dropout_rng
    )


def pool_rows(tok_rows: Array, tokens: Array) -> Array:
    """Masked-mean pool of pre-gathered token rows ``[B, T, E]`` (token 0 =
    PAD) -> ``[B, E]``. Single source of truth for embedding-bag pooling —
    used by ``pool_text`` and the sparse training path."""
    mask = (tokens != 0).astype(tok_rows.dtype)[..., None]
    total = jnp.sum(tok_rows * mask, axis=1)
    count = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    return total / count


def pool_text(params: Params, tokens: Array) -> Array:
    """Embedding-bag over hashed n-gram tokens: masked mean of bucket
    embeddings. ``tokens`` is ``[B, T]`` int32 -> ``[B, E]``."""
    return pool_rows(params["text_embedding"][tokens], tokens)


def apply_item_tower(
    params: Params,
    emb: Array,
    config: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Array | None = None,
) -> Array:
    """Candidate-tower MLP over pre-gathered (and text-combined) rows."""
    out = _apply_tower(
        params["item_tower"],
        emb,
        compute_dtype=jnp.dtype(config.compute_dtype),
        dropout_rate=config.dropout_rate if train else 0.0,
        dropout_rng=dropout_rng,
    )
    return _maybe_normalize(out, config.normalize_embeddings)


def embed_items(
    params: Params,
    item_idx: Array,
    config: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Array | None = None,
    text_tokens: Array | None = None,
) -> Array:
    """Candidate tower: table gather (+ pooled text embedding) -> MLP ->
    optional L2 normalize. ``text_tokens``: optional ``[B, T]`` hashed
    n-gram ids aligned with ``item_idx`` (features/text_encoder.py)."""
    emb = params["item_embedding"][item_idx]
    if text_tokens is not None:
        if "text_embedding" not in params:
            raise ValueError("model has no text tower (set model.text_buckets > 0)")
        emb = emb + pool_text(params, text_tokens)
    return apply_item_tower(
        params, emb, config, train=train, dropout_rng=dropout_rng
    )


def embed_item_table(
    params: Params,
    config: ModelConfig,
    num_items: int,
    *,
    chunk_size: int = 65536,
    item_tokens: Array | None = None,
) -> Array:
    """Materialize the full item-corpus embedding matrix ``[num_items, D]``
    by streaming the (padded) table through the candidate tower in chunks —
    the corpus encode pass used by evaluation and index building.
    ``item_tokens``: optional per-item hashed text ``[num_items, T]``."""
    padded = params["item_embedding"].shape[0]
    chunk_size = min(chunk_size, padded)

    def encode(idx_chunk: Array) -> Array:
        tokens = None
        if item_tokens is not None:
            # Clamp: padding rows re-read item 0's tokens, then get sliced off.
            tokens = item_tokens[jnp.minimum(idx_chunk, num_items - 1)]
        return embed_items(params, idx_chunk, config, train=False, text_tokens=tokens)

    num_chunks = -(-padded // chunk_size)
    total = num_chunks * chunk_size
    idx = jnp.arange(total, dtype=jnp.int32) % padded
    out = jax.lax.map(encode, idx.reshape(num_chunks, chunk_size))
    return out.reshape(total, -1)[:num_items]


def forward(
    params: Params,
    user_idx: Array,
    item_idx: Array,
    config: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Array | None = None,
) -> tuple[Array, Array]:
    """Both towers for one batch -> (user_emb ``[B, D]``, item_emb ``[B, D]``)."""
    if dropout_rng is not None:
        u_rng, i_rng = jax.random.split(dropout_rng)
    else:
        u_rng = i_rng = None
    return (
        embed_users(params, user_idx, config, train=train, dropout_rng=u_rng),
        embed_items(params, item_idx, config, train=train, dropout_rng=i_rng),
    )


def gathered_embeddings(params: Params, user_idx: Array, item_idx: Array) -> list[Array]:
    """Embedding rows touched by a batch — the sparse L2 set (ops/losses.py)."""
    return [params["user_embedding"][user_idx], params["item_embedding"][item_idx]]

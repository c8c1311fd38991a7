"""Train state + optimizer factory.

The reference's training module is an empty placeholder (reference:
src/training/__init__.py:1; entry point declared at pyproject.toml:67 with
hyperparameters at configs/data_config.yaml:61-66). This realizes it:
an optax optimizer built from ``TrainingConfig`` and an immutable pytree
train state that jit/pjit can thread through compiled steps.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

from twotower_tpu.config import TrainingConfig

Array = jax.Array


@struct.dataclass
class TrainState:
    """Immutable training state (a pytree: donate-able, shardable).

    ``opt_state`` covers the dense (tower) params; ``table_state`` holds the
    per-table Adam moments when sparse row updates are enabled (None on the
    dense path, where ``opt_state`` covers everything).
    """

    step: Array
    params: Any
    opt_state: Any
    table_state: Any = None

    @classmethod
    def create(cls, params: Any, optimizer: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
        )

    @classmethod
    def for_config(
        cls, params: Any, optimizer: optax.GradientTransformation, config: Any
    ) -> "TrainState":
        """State matching ``config.training.sparse_table_updates``."""
        if config.training.effective_sparse_updates():
            return cls.create_sparse(params, optimizer)
        return cls.create(params, optimizer)

    @classmethod
    def create_sparse(
        cls, params: Any, optimizer: optax.GradientTransformation
    ) -> "TrainState":
        """State for the sparse-table path: optimizer over dense params only,
        explicit Adam moments per embedding table."""
        import jax.numpy as jnp

        from twotower_tpu.training.sparse import init_table_state, split_params

        tables, dense = split_params(params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(dense),
            table_state=init_table_state(tables),
        )


def init_train_state(
    config: Any,
    optimizer: optax.GradientTransformation,
    num_users: int,
    num_items: int,
    mesh: Any = None,
    *,
    text_embedding_init: Any = None,
) -> TrainState:
    """Fresh seeded state for a trainer, placed for its execution mode.

    The ONE builder both trainers (host loop and device loop) share, so a
    state-layout or sharding-rule change cannot ship in one trainer and not
    the other. On a mesh: sparse mesh path -> sparse TrainState with tables
    (and their moments) sharded over the combined axis; dense GSPMD path ->
    dense state with model-axis table rows. Single device: layout per
    ``training.sparse_table_updates``.
    """
    from twotower_tpu.models import two_tower

    rng = jax.random.PRNGKey(config.training.seed)
    params = two_tower.init_params(
        rng, config.model, num_users, num_items,
        text_embedding_init=text_embedding_init,
    )
    if mesh is not None:
        from twotower_tpu.parallel.sharding import shard_state
        from twotower_tpu.parallel.sparse_spmd import use_sparse_mesh_path

        if use_sparse_mesh_path(config):
            state = TrainState.for_config(params, optimizer, config)
            return shard_state(mesh, state, config.mesh, sparse_mesh=True)
        state = TrainState.create(params, optimizer)
        return shard_state(mesh, state, config.mesh)
    return TrainState.for_config(params, optimizer, config)


def _lr_schedule(config: TrainingConfig):
    """Warmup + optional cosine decay (training.decay_steps) to 1% of
    peak. The ONE schedule shared by the dense optax chain and the sparse
    lazy-Adam row updates (training.sparse.make_lr_fn delegates here)."""
    if config.decay_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if config.warmup_steps > 0 else config.learning_rate,
            peak_value=config.learning_rate,
            warmup_steps=max(config.warmup_steps, 0),
            decay_steps=max(config.warmup_steps, 0) + config.decay_steps,
            end_value=0.01 * config.learning_rate,
        )
    return optax.linear_schedule(
        0.0, config.learning_rate, config.warmup_steps
    )


def make_optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    """Build the optimizer chain from config (reference schema:
    optimizer adam, lr 0.001 — configs/data_config.yaml:62-63)."""
    lr: Any = config.learning_rate
    if config.warmup_steps > 0 or config.decay_steps > 0:
        lr = _lr_schedule(config)
    name = config.optimizer.lower()
    if name == "adam":
        tx = optax.adam(lr)
    elif name == "adamw":
        tx = optax.adamw(lr, weight_decay=config.weight_decay)
    elif name == "adagrad":
        tx = optax.adagrad(lr)
    elif name == "sgd":
        tx = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {config.optimizer!r}")
    if config.weight_decay > 0 and name != "adamw":
        tx = optax.chain(optax.add_decayed_weights(config.weight_decay), tx)
    return tx

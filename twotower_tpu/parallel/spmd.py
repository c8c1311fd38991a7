"""Sharded (mesh-wide) train and eval steps.

One jitted SPMD program per step: GSPMD partitions the tower matmuls over the
``data`` axis and the embedding gathers/scatters over the row-sharded tables
on the ``model`` axis, inserting the collectives (all-to-all for table
lookups, psum for dense grads, all-gather for the in-batch score matrix) that
the reference never had a backend for (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh

from twotower_tpu.config import Config
from twotower_tpu.parallel.sharding import batch_shardings, replicated, state_shardings
from twotower_tpu.training.loop import make_step_fn
from twotower_tpu.training.state import TrainState


def make_sharded_train_step(
    config: Config,
    optimizer,
    mesh: Mesh,
    state_template: TrainState,
    log_q: Any = None,
    *,
    item_tokens: Any = None,
    num_items: int | None = None,
    donate: bool = True,
):
    """Jit the shared step function with explicit mesh shardings.

    ``state_template`` supplies the pytree structure for sharding inference
    (abstract shapes suffice — pass the real state or ``jax.eval_shape``
    output). Returns a step callable with state donated, batch split on
    ``data``, and replicated metrics out.

    Dispatch: when the config enables sparse table updates (and the model/
    sampling combination supports them — ``use_sparse_mesh_path``), this
    builds the shard_map-based sparse step (parallel/sparse_spmd.py: a2a
    lookups + distributed gradient scatter, tables sharded over the combined
    mesh); otherwise the dense GSPMD step below.
    """
    from twotower_tpu.parallel.sparse_spmd import (
        make_sparse_sharded_train_step,
        use_sparse_mesh_path,
    )

    if use_sparse_mesh_path(config):
        if state_template.table_state is None:
            raise ValueError(
                "config enables sparse mesh training but the state has no "
                "table_state — build it with TrainState.for_config and shard "
                "with state_shardings(..., sparse_mesh=True)"
            )
        return make_sparse_sharded_train_step(
            config,
            optimizer,
            mesh,
            state_template,
            log_q,
            item_tokens=item_tokens,
            donate=donate,
        )
    # Dense GSPMD path. Pallas kernels only when the mesh is a single
    # device: GSPMD cannot auto-partition pallas_call, and the in-batch loss
    # needs the full batch.
    raw = make_step_fn(
        config, optimizer, allow_pallas=mesh.devices.size == 1, num_items=num_items
    )
    st_sh = state_shardings(mesh, state_template, config.mesh)
    b_sh = batch_shardings(mesh, config.mesh)
    rep = replicated(mesh)
    metrics_sh = {
        "accuracy": rep,
        "logits_mean": rep,
        "loss": rep,
        "grad_norm": rep,
    }
    import jax.numpy as jnp

    lq = (
        jax.device_put(jnp.asarray(log_q, jnp.float32), rep)
        if log_q is not None
        else None
    )
    tok = (
        jax.device_put(jnp.asarray(item_tokens), rep)
        if item_tokens is not None
        else None
    )
    jitted = jax.jit(
        raw,
        in_shardings=(
            st_sh,
            {"user_idx": b_sh, "item_idx": b_sh, "weight": b_sh},
            rep,
            None if lq is None else rep,
            None if tok is None else rep,
        ),
        out_shardings=(st_sh, metrics_sh),
        donate_argnums=(0,) if donate else (),
    )

    def step(state, batch, rng):
        return jitted(state, batch, rng, lq, tok)

    return step


def make_sharded_eval_step(config: Config, mesh: Mesh, num_items: int, max_k: int):
    """Mesh-wide corpus encode + top-k + metrics.

    The corpus stays row-sharded over ``model``; queries split over ``data``;
    top-k runs against the (XLA-gathered) corpus with metric scalars psummed
    to replicated outputs.
    """
    import jax.numpy as jnp

    from twotower_tpu.evaluation.metrics import metrics_at_k
    from twotower_tpu.models import two_tower
    from twotower_tpu.ops.topk import topk_mips

    mcfg = config.model
    mesh_cfg = config.mesh
    ks = tuple(k for k in sorted(config.retrieval.top_k_eval) if k <= max_k)
    rep = replicated(mesh)
    b_sh = batch_shardings(mesh, mesh_cfg)

    def encode_corpus(params):
        return two_tower.embed_item_table(params, mcfg, num_items)

    def eval_batch(params, corpus, user_idx, true_item, weight):
        user_emb = two_tower.embed_users(params, user_idx, mcfg, train=False)
        _, topk_idx = topk_mips(user_emb, corpus, max_k)
        return metrics_at_k(topk_idx, true_item, ks, weights=weight)

    encode = jax.jit(encode_corpus, out_shardings=rep)
    evalb = jax.jit(
        eval_batch,
        in_shardings=(None, rep, b_sh, b_sh, b_sh),
        out_shardings={f"recall@{k}": rep for k in ks}
        | {f"ndcg@{k}": rep for k in ks}
        | {"mrr": rep},
    )
    return encode, evalb

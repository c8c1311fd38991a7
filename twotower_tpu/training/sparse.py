"""Sparse (row-wise) embedding-table training step.

The dense path materializes full-table gradients and runs Adam over every
row each step — at 1.5M x 128 rows that is ~2 GB of HBM traffic per step and
dominates the step time (measured: 14.4 ms/step vs 2.6 ms with tiny tables
on v5e). This module implements the TPU-native alternative the BASELINE
north star calls "gradient scatter": differentiate w.r.t. the *gathered
rows*, dedup duplicate ids inside the batch (sort + segment-sum, static
shapes), and scatter-add a lazy-Adam row update onto only the touched rows.

Semantics vs dense Adam: identical for every touched row on every step in
which it is touched; untouched rows carry no momentum decay (lazy Adam — the
standard and empirically preferable convention for embedding tables).

Duplicate/invalid scatter targets are aimed at the table's reserved dead row
(``models.two_tower.dead_row``) with zero-masked updates, keeping every
scatter target unique-or-harmless without dynamic shapes.

Scatter implementation decision (measured on v5e, slope-timed, 4096 rows
into 500k x 128 + packed [N,2E] moments, per update):
  - XLA gather + scatter-ADD (this module):            0.94 ms
  - gather rows + moments, scatter-SET both:           0.96 ms
  - fully packed [N,3E] state, 1 gather + 1 SET:       1.08 ms
  - Pallas per-row async-DMA kernel (128 in flight):   2.5-2.7 ms
  - ``indices_are_sorted=True`` hints on the gather/scatters (the dedup
    targets ARE sorted): 7.7x SLOWER (5.1 ms vs 0.67 ms at 1M rows,
    round-3 probe) — the hint routes XLA:TPU to a worse scatter path;
    ``unique_indices`` is a no-op. Leave the hints OFF.
XLA's scatter-add pipeline wins outright: the update is bound by random
row-access latency the hardware already hides as well as it can, NOT by
transaction count (the [N,3E] repack REDUCES transactions 2.5x and still
loses) nor bytes. The Pallas kernel scaffold was therefore deleted
(round-2); the XLA path below is the production dispatch everywhere.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from twotower_tpu.config import TrainingConfig

Array = jax.Array

TABLE_NAMES = ("user_embedding", "item_embedding", "text_embedding")


def split_params(params: dict) -> tuple[dict, dict]:
    """(tables, dense) partition of the parameter pytree."""
    tables = {k: v for k, v in params.items() if k in TABLE_NAMES}
    dense = {k: v for k, v in params.items() if k not in TABLE_NAMES}
    return tables, dense


def init_table_state(tables: dict) -> dict:
    """Adam moments per table, PACKED as one ``[rows, 2E]`` array
    (``[:, :E]`` = mu, ``[:, E:]`` = nu): the row update is bound by the
    count of per-row transfers, and packing turns two gathers + two
    scatters into one of each (measured ~30% off the step time)."""
    return {
        name: {
            "moments": jnp.zeros((t.shape[0], 2 * t.shape[1]), t.dtype)
        }
        for name, t in tables.items()
    }


def dedup_rows(ids: Array, grads: Array, dead: int) -> tuple[Array, Array, Array]:
    """Combine duplicate ids: sort + segment-sum with static shapes.

    Returns (targets [B], summed_grads [B, E], valid [B]): for each segment
    (unique id) one valid row holding the summed gradient and the id as
    scatter target; all other rows target the dead row with zero updates.
    """
    b = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = grads[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(first) - 1  # segment index per sorted row, in [0, B)
    summed = jax.ops.segment_sum(sg, seg, num_segments=b)  # [B, E]
    seg_ids = jax.ops.segment_max(sid, seg, num_segments=b)  # id per segment
    counts = jax.ops.segment_sum(jnp.ones_like(sid), seg, num_segments=b)
    valid = counts > 0
    targets = jnp.where(valid, seg_ids, dead)
    return targets, summed, valid


def adam_row_update(
    table: Array,
    mu: Array,
    nu: Array,
    targets: Array,
    grads: Array,
    valid: Array,
    *,
    lr: Array,
    b1: float,
    b2: float,
    eps: float,
    step: Array,
) -> tuple[Array, Array, Array]:
    """Lazy-Adam update of the targeted rows only (scatter-add deltas).

    Reference form with separate mu/nu arrays — the semantics twin the
    packed fast path (``adam_row_update_packed``) is golden-tested
    against."""
    mask = valid.astype(table.dtype)[:, None]
    mu_rows = mu[targets]
    nu_rows = nu[targets]
    new_mu = b1 * mu_rows + (1.0 - b1) * grads
    new_nu = b2 * nu_rows + (1.0 - b2) * jnp.square(grads)
    t = step.astype(jnp.float32)
    mu_hat = new_mu / (1.0 - b1**t)
    nu_hat = new_nu / (1.0 - b2**t)
    update = lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    table = table.at[targets].add(-update * mask)
    mu = mu.at[targets].add((new_mu - mu_rows) * mask)
    nu = nu.at[targets].add((new_nu - nu_rows) * mask)
    return table, mu, nu


def adam_row_update_packed(
    table: Array,
    moments: Array,
    targets: Array,
    grads: Array,
    valid: Array,
    *,
    lr: Array,
    b1: float,
    b2: float,
    eps: float,
    step: Array,
) -> tuple[Array, Array]:
    """Lazy Adam with mu/nu packed as ``moments[:, :E] / [:, E:]`` — one
    gather and one scatter for both moments (row-transfer count is the
    bottleneck on TPU scatters)."""
    e = table.shape[1]
    mask = valid.astype(table.dtype)[:, None]
    mo_rows = moments[targets]
    mu_rows = mo_rows[:, :e]
    nu_rows = mo_rows[:, e:]
    new_mu = b1 * mu_rows + (1.0 - b1) * grads
    new_nu = b2 * nu_rows + (1.0 - b2) * jnp.square(grads)
    t = step.astype(jnp.float32)
    mu_hat = new_mu / (1.0 - b1**t)
    nu_hat = new_nu / (1.0 - b2**t)
    update = lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    table = table.at[targets].add(-update * mask)
    new_mo = jnp.concatenate([new_mu, new_nu], axis=1)
    moments = moments.at[targets].add((new_mo - mo_rows) * mask)
    return table, moments


def make_lr_fn(config: TrainingConfig) -> Callable[[Array], Array]:
    """The SAME optax schedule the dense optimizer uses
    (training.state.make_optimizer) — one source of truth for lr."""
    if config.warmup_steps > 0 or config.decay_steps > 0:
        from twotower_tpu.training.state import _lr_schedule

        return _lr_schedule(config)
    base = jnp.asarray(config.learning_rate, jnp.float32)
    return lambda step: base


def make_sparse_step_fn(
    config,
    dense_optimizer,
    *,
    allow_pallas: bool = True,
    num_items: int | None = None,
):
    """Train step with sparse table updates:
    ``step(state, batch, rng, log_q=None, item_tokens=None)``.

    Differentiates the loss w.r.t. the gathered embedding rows (not the
    tables), applies the dense optimizer to the towers and lazy-Adam row
    scatters to the tables. Drop-in replacement for
    ``training.loop.make_step_fn`` (same signature contract — log_q and
    item_tokens are jit ARGUMENTS, never closures; see make_loss_fn).
    Supports ``in_batch``, ``uniform`` and ``mixed`` candidate sampling
    (``num_items`` is required for the latter two).
    """
    import optax

    from twotower_tpu.models import two_tower
    from twotower_tpu.ops.dispatch import in_batch_softmax_loss_auto
    from twotower_tpu.ops.losses import (
        in_batch_softmax_loss,
        l2_penalty,
        mixed_sampled_softmax_loss,
        uniform_sampled_softmax_loss,
    )

    mcfg = config.model
    rcfg = config.retrieval
    tcfg = config.training
    lr_fn = make_lr_fn(tcfg)
    loss_impl = in_batch_softmax_loss_auto if allow_pallas else in_batch_softmax_loss
    mode = rcfg.candidate_sampling
    uniform = mode == "uniform"
    sample_negs = mode in ("uniform", "mixed")
    if sample_negs and num_items is None:
        raise ValueError(f"{mode} candidate sampling needs num_items")

    def step(
        state,
        batch: dict,
        rng: Array,
        log_q: Array | None = None,
        item_tokens: Array | None = None,
    ):
        from twotower_tpu.training.state import TrainState

        tables, dense = split_params(state.params)
        u_ids = batch["user_idx"]
        i_ids = batch["item_idx"]
        dropout_rng = jax.random.fold_in(rng, state.step)

        # Gather every differentiated row tensor up front; the loss is a
        # function of this dict pytree, so jax.grad returns matching row
        # gradients for the scatter updates.
        diff: dict[str, Array] = {
            "dense": dense,
            "u_rows": tables["user_embedding"][u_ids],
            "i_rows": tables["item_embedding"][i_ids],
        }
        tokens = item_tokens[i_ids] if item_tokens is not None else None
        if tokens is not None:
            diff["tok_rows"] = tables["text_embedding"][tokens]
        neg_ids = None
        neg_tokens = None
        if sample_negs:
            neg_rng = jax.random.fold_in(dropout_rng, 0x5E9)
            neg_ids = jax.random.randint(
                neg_rng, (rcfg.num_negatives,), 0, num_items, dtype=jnp.int32
            )
            diff["neg_rows"] = tables["item_embedding"][neg_ids]
            if item_tokens is not None:
                neg_tokens = item_tokens[neg_ids]
                diff["neg_tok_rows"] = tables["text_embedding"][neg_tokens]

        def loss_fn(diff):
            dense_p = diff["dense"]
            u_rng, i_rng = jax.random.split(dropout_rng)
            u_emb = two_tower.apply_user_tower(
                dense_p, diff["u_rows"], mcfg, train=True, dropout_rng=u_rng
            )
            item_in = diff["i_rows"]
            if "tok_rows" in diff:
                item_in = item_in + two_tower.pool_rows(diff["tok_rows"], tokens)
            i_emb = two_tower.apply_item_tower(
                dense_p, item_in, mcfg, train=True, dropout_rng=i_rng
            )
            if sample_negs:
                neg_in = diff["neg_rows"]
                if "neg_tok_rows" in diff:
                    neg_in = neg_in + two_tower.pool_rows(diff["neg_tok_rows"], neg_tokens)
                neg_emb = two_tower.apply_item_tower(
                    dense_p, neg_in, mcfg, train=True, dropout_rng=i_rng
                )
                if uniform:
                    loss, metrics = uniform_sampled_softmax_loss(
                        u_emb,
                        i_emb,
                        neg_emb,
                        temperature=rcfg.temperature,
                        weights=batch.get("weight"),
                        pos_idx=i_ids,
                        neg_idx=neg_ids,
                    )
                else:
                    loss, metrics = mixed_sampled_softmax_loss(
                        u_emb,
                        i_emb,
                        i_ids,
                        neg_emb,
                        neg_ids,
                        temperature=rcfg.temperature,
                        log_q=log_q if rcfg.logq_correction else None,
                        num_items=num_items,
                        weights=batch.get("weight"),
                    )
            else:
                loss, metrics = loss_impl(
                    u_emb,
                    i_emb,
                    i_ids,
                    temperature=rcfg.temperature,
                    log_q=log_q if rcfg.logq_correction else None,
                    weights=batch.get("weight"),
                )
            if mcfg.l2_regularization > 0:
                reg = l2_penalty(dense_p, [diff["u_rows"], diff["i_rows"]])
                loss = loss + mcfg.l2_regularization * reg
            metrics["loss"] = loss
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(diff)

        updates, new_opt = dense_optimizer.update(
            grads["dense"], state.opt_state, dense
        )
        new_dense = optax.apply_updates(dense, updates)

        item_grad_ids = i_ids
        item_grads = grads["i_rows"]
        if sample_negs:
            item_grad_ids = jnp.concatenate([i_ids, neg_ids])
            item_grads = jnp.concatenate([grads["i_rows"], grads["neg_rows"]])
        row_grads: dict[str, tuple[Array, Array]] = {
            "user_embedding": (u_ids, grads["u_rows"]),
            "item_embedding": (item_grad_ids, item_grads),
        }
        if tokens is not None:
            tok_ids = tokens.reshape(-1)
            tok_grads = grads["tok_rows"].reshape(tok_ids.shape[0], -1)
            if sample_negs and "neg_tok_rows" in grads:
                n_ids = neg_tokens.reshape(-1)
                tok_ids = jnp.concatenate([tok_ids, n_ids])
                tok_grads = jnp.concatenate(
                    [tok_grads, grads["neg_tok_rows"].reshape(n_ids.shape[0], -1)]
                )
            row_grads["text_embedding"] = (tok_ids, tok_grads)
        # Host-precomputed dedup (training/host_dedup.py): users always,
        # items only when the grads are purely the batch's ids (in_batch
        # sampling — sampled negatives are device-generated, the host never
        # sees them).
        pre: dict[str, tuple[Array, Array, Array]] = {}
        if "u_targets" in batch:
            pre["user_embedding"] = (
                batch["u_targets"], batch["u_seg"], batch["u_valid"]
            )
        if "i_targets" in batch and not sample_negs:
            pre["item_embedding"] = (
                batch["i_targets"], batch["i_seg"], batch["i_valid"]
            )
        step_num = state.step + 1
        new_tables, new_table_state, tbl_norm_sq = sparse_table_updates(
            tables,
            state.table_state,
            row_grads,
            lr=lr_fn(state.step),
            step=step_num,
            pre=pre or None,
        )
        metrics["grad_norm"] = jnp.sqrt(
            optax.global_norm(grads["dense"]) ** 2 + tbl_norm_sq
        )
        new_state = TrainState(
            step=step_num,
            params={**new_tables, **new_dense},
            opt_state=new_opt,
            table_state=new_table_state,
        )
        return new_state, metrics

    return step


def sparse_table_updates(
    tables: dict,
    table_state: dict,
    row_grads: dict[str, tuple[Array, Array]],
    *,
    lr: Array,
    step: Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    pre: dict[str, tuple[Array, Array, Array]] | None = None,
) -> tuple[dict, dict, Array]:
    """Apply row updates for every table with gradients this step.

    ``row_grads``: table name -> (ids [R], grads [R, E]); ids may repeat.
    ``pre``: optional host-precomputed dedup per table —
    ``name -> (targets [R], seg [R], valid [R])`` from
    ``training.host_dedup`` — which replaces the in-device argsort+segment
    dedup with one grads scatter-add (``summed[seg[j]] += grads[j]``);
    tables absent from ``pre`` keep the in-device path. Returns (new tables
    dict, new table_state dict, grad-norm-squared contribution).
    """
    from twotower_tpu.models.two_tower import dead_row

    norm_sq = jnp.asarray(0.0, jnp.float32)
    new_tables = dict(tables)
    new_state = {k: dict(v) for k, v in table_state.items()}
    for name, (ids, grads) in row_grads.items():
        table = tables[name]
        if pre is not None and name in pre:
            targets, seg, valid = pre[name]
            summed = jnp.zeros_like(grads).at[seg].add(grads)
        else:
            targets, summed, valid = dedup_rows(ids, grads, dead_row(table))
        t, mo = adam_row_update_packed(
            table,
            table_state[name]["moments"],
            targets,
            summed,
            valid,
            lr=lr,
            b1=b1,
            b2=b2,
            eps=eps,
            step=step,
        )
        new_tables[name] = t
        new_state[name] = {"moments": mo}
        norm_sq = norm_sq + jnp.sum(
            jnp.square(summed) * valid.astype(jnp.float32)[:, None]
        )
    return new_tables, new_state, norm_sq

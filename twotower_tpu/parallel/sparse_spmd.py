"""Sharded SPARSE train step: all-to-all lookups + distributed gradient scatter.

This is the flagship distributed path the BASELINE north star describes
("all-to-all ID exchange and gradient scatter" over row-sharded embedding
tables) — the composition of the single-device sparse step
(training/sparse.py: differentiate w.r.t. gathered rows, lazy-Adam only the
touched rows) with explicit mesh collectives, so multi-chip training never
materializes a full-table gradient (the ~2 GB/step HBM-traffic problem the
dense mesh path has at 10M-row tables).

Layout (differs from the dense GSPMD path in parallel/spmd.py):

- Embedding tables AND their packed Adam moments are row-sharded over the
  COMBINED ``(data, model)`` axis — every device owns a distinct slice of
  rows (maximum table scale, no replica-consistency bookkeeping). Global row
  ``g`` lives on device ``g // rows_per_shard`` in data-major mesh order,
  matching ``P((data, model), None)``.
- Dense tower params/opt state replicated; batch split over ``data``.

Per-device step (inside one ``shard_map``):

1. Each model peer takes a ``1/S`` slice of its data shard's ids and
   gathers the rows over the combined axis (``a2a.alltoall_lookup``).
   The rows STAY per-peer — model-axis tower sharding: each peer runs the
   towers on its ``b/(D*S)`` row slice only (at S=4 that is 4x less tower
   FLOPs per device than replicating the shard's rows), and only the
   F-wide tower OUTPUTS are ``all_gather``-ed along ``model`` where the
   loss needs columns — never the E-wide embedding rows.
2. ``jax.grad`` INSIDE the body differentiates each device's share of the
   global loss (its ``[b/(D*S), B]`` score block against the item columns
   reassembled along ``model`` and — unless
   ``retrieval.shard_local_negatives`` — all-gathered along ``data``).
   The gathers' transposes (reduce-scatter / psum-scatter) sum the
   column cotangents back to the owning peers automatically; the in-batch
   loss runs the fused Pallas block kernel on TPU (ops/pallas_kernels.py)
   and the XLA twin elsewhere.
3. Dense grads are ``psum``-ed over the COMBINED axis (each peer towers a
   distinct row block) — optionally in bf16 (``mesh.dense_grad_dtype``) —
   and applied with the optax optimizer.
4. Each peer routes the row gradients of its slice to the owner shards
   (``a2a.alltoall_row_update``): all-to-all exchange, owner-side dedup
   (sort + segment-sum), packed lazy-Adam on the local rows. Summing
   duplicate rows across devices happens at the owner by construction.

Numeric parity with the single-device sparse step is golden-tested on the
8-device CPU mesh for (data x model) in {8x1, 4x2, 2x4, 1x8}
(tests/test_sparse_spmd.py). The reference has no distributed code at all
(SURVEY.md §2.2 row 22; reference README.md:17 declares the capability).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from twotower_tpu.config import Config
from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)

Array = jax.Array


def use_sparse_mesh_path(config: Config) -> bool:
    """Whether the mesh train step should run the sparse (a2a + scatter)
    path. Every candidate-sampling mode (in_batch, mixed, uniform) has a
    sparse mesh branch — mixed/uniform negative counts that don't split over
    the model axis are padded internally, so no configuration silently loses
    the flagship optimization. The dense GSPMD step remains only for
    configurations the sparse math does not model: non-Adam optimizers /
    weight decay (``effective_sparse_updates``) and unsharded tables."""
    return bool(
        config.training.effective_sparse_updates()
        and config.mesh.shard_embeddings
    )


def _capacity(k: int, num_shards: int, factor: float) -> int:
    """Per-destination a2a bucket capacity for ``k`` local ids over
    ``num_shards`` owners. ``factor <= 0`` -> worst-case ``k`` (zero drops);
    otherwise ``factor x`` the uniform expectation, rounded up to 8 (drops
    are counted and surfaced in the step metrics as ``dropped_ids``)."""
    if factor <= 0:
        return k
    cap = -(-int(factor * k) // num_shards)
    cap = -(-cap // 8) * 8
    return max(8, min(cap, k))


def make_sparse_sharded_train_step(
    config: Config,
    optimizer,
    mesh: Mesh,
    state_template: Any,
    log_q: Any = None,
    *,
    item_tokens: Any = None,
    num_items: int | None = None,
    donate: bool = True,
    return_raw: bool = False,
):
    """Build the jitted sharded sparse step ``(state, batch, rng)``.

    ``state_template`` must be a sparse TrainState (``table_state`` holds
    packed moments) sharded per ``sharding.state_shardings(...,
    sparse_mesh=True)``; batch arrays split over the data axis.

    ``return_raw``: instead of the jitted step, return the unjitted
    ``(mapped, fixed, st_spec, metrics_spec)`` — the shard_map'd body plus
    its replicated side inputs and partition specs — so callers can embed
    the step inside a larger jitted program (the device-resident epoch
    loop, ``parallel.spmd.make_sharded_epoch_fn``).
    """
    import math

    from twotower_tpu.models import two_tower
    from twotower_tpu.ops import pallas_kernels
    from twotower_tpu.ops.dispatch import pallas_enabled
    from twotower_tpu.ops.losses import (
        in_batch_softmax_block,
        l2_penalty,
        mixed_softmax_block,
        uniform_softmax_block,
    )
    from twotower_tpu.parallel.a2a import alltoall_lookup, alltoall_row_update
    from twotower_tpu.parallel.sharding import state_pspecs
    from twotower_tpu.training.sparse import make_lr_fn, split_params
    from twotower_tpu.training.state import TrainState

    mcfg = config.model
    rcfg = config.retrieval
    tcfg = config.training
    mesh_cfg = config.mesh
    data_ax, model_ax = mesh_cfg.data_axis, mesh_cfg.model_axis
    comb = (data_ax, model_ax)
    num_data = mesh.shape[data_ax]
    num_model = mesh.shape[model_ax]
    world = num_data * num_model

    mode = rcfg.candidate_sampling
    mixed = mode == "mixed"
    uniform = mode == "uniform"
    sample_negs = mixed or uniform
    num_negs = rcfg.num_negatives if sample_negs else 0
    if sample_negs and num_items is None:
        raise ValueError(f"{mode} candidate sampling needs num_items")
    # The a2a gather slices ids 1/num_model per peer; counts that don't
    # divide are padded for the EXCHANGE only (pad slots repeat neg_ids[0],
    # are sliced off before the loss, and route zero gradients), so the
    # sampled set — and bit parity with the single-device step — is exactly
    # the configured num_negatives.
    negs_padded = -(-num_negs // num_model) * num_model if sample_negs else 0
    log_uniform = -math.log(num_items) if mixed else 0.0
    # Shard-local candidate columns (retrieval.shard_local_negatives): skip
    # the data-axis item-column all_gather entirely — the pod-scale scaling
    # wall (docs/architecture.md dossier: 60 MiB/step/device at 64 chips).
    # Each row then scores b_local in-batch columns (+ the shared sampled
    # negatives for mixed). Uniform sampling is already gather-free.
    local_cols = bool(rcfg.shard_local_negatives) and not uniform

    batch_size = tcfg.batch_size
    if batch_size % (num_data * num_model) != 0:
        raise ValueError(
            f"training.batch_size={batch_size} must divide by "
            f"num_data*num_model={num_data}x{num_model} for the sparse mesh step"
        )
    b_local = batch_size // num_data

    if state_template.table_state is None:
        raise ValueError(
            "sparse mesh step needs a sparse TrainState "
            "(TrainState.for_config with sparse_table_updates on)"
        )
    tables_t, _ = split_params(state_template.params)
    for name, t in tables_t.items():
        if t.shape[0] % world != 0:
            raise ValueError(
                f"table {name!r} rows {t.shape[0]} not divisible by the "
                f"{world}-device mesh (pad tables to a multiple)"
            )

    out_dim = list(mcfg.item_tower_dims)[-1]
    # Fused Pallas block kernel on TPU when the [b_local, B] block fits
    # (in-batch columns only; the mixed/uniform losses have sampled-negative
    # blocks and run the XLA twins).
    # Tower rows per model peer (model-axis tower sharding): the loss row
    # block is k_rows, its columns b_local (shard-local) or the full batch.
    k_rows_static = b_local // num_model
    use_pallas = (
        not sample_negs
        and pallas_enabled()
        and jax.default_backend() == "tpu"
        and pallas_kernels.supported_block(
            k_rows_static, b_local if local_cols else batch_size, out_dim
        )
    )
    # bf16 dense-grad all-reduce (mesh.dense_grad_dtype): halves the ring
    # bytes of the combined-axis psum; Adam still updates in f32.
    grad_dtype = (
        jnp.bfloat16 if mesh_cfg.dense_grad_dtype == "bfloat16" else None
    )
    loss_block = (
        pallas_kernels.fused_in_batch_softmax_block if use_pallas
        else in_batch_softmax_block
    )
    logger.info(
        "sparse mesh step: mesh=(%s=%d, %s=%d), local_batch=%d, pallas=%s, "
        "columns=%s",
        data_ax, num_data, model_ax, num_model, b_local, use_pallas,
        "shard-local" if local_cols else "global",
    )

    lr_fn = make_lr_fn(tcfg)
    cap_factor = mesh_cfg.a2a_capacity_factor
    tok_width = int(item_tokens.shape[1]) if item_tokens is not None else 0

    def body(state, batch, rng, fixed):
        lq = fixed.get("log_q")
        item_tok = fixed.get("item_tokens")
        tables, dense = split_params(state.params)
        d_idx = jax.lax.axis_index(data_ax)
        m_idx = jax.lax.axis_index(model_ax)
        ids_u = batch["user_idx"]
        ids_i = batch["item_idx"]
        w = batch["weight"].astype(jnp.float32)

        def slice_of(x, k):
            return jax.lax.dynamic_slice_in_dim(x, m_idx * k, k, axis=0)

        def gather(name, flat_ids):
            """Model-peer-sliced lookup over the combined row axis. Returns
            (my 1/M slice of rows, my ids, drop count) — rows stay PER-PEER:
            the towers run on each peer's slice (model-axis tower sharding)
            and only the F-wide tower OUTPUTS are reassembled, never the
            E-wide embedding rows. At M=4 this quarters per-device tower
            FLOPs and shrinks the model-axis gather from E-wide inputs to
            F-wide outputs (scaling dossier term 2)."""
            k = flat_ids.shape[0] // num_model
            my_ids = slice_of(flat_ids, k)
            rows_m, drop = alltoall_lookup(
                tables[name],
                my_ids,
                axis_name=comb,
                capacity=_capacity(k, world, cap_factor),
                return_stats=True,
            )
            return rows_m, my_ids, drop

        k_rows = b_local // num_model  # tower rows per model peer
        u_rows, my_ids_u, drop_fwd = gather("user_embedding", ids_u)
        i_rows, my_ids_i, d2 = gather("item_embedding", ids_i)
        drop_fwd = drop_fwd + d2
        tokens_m = None
        if item_tok is not None:
            tokens = item_tok[ids_i]  # [b, T]
            # The flattened-token slice [m*k*T, (m+1)*k*T) is exactly rows
            # [m*k, (m+1)*k)'s tokens (row-major), so the a2a's per-peer
            # slicing aligns with the item-row slicing by construction.
            tok_rows_flat, _tok_ids, d3 = gather(
                "text_embedding", tokens.reshape(-1)
            )
            drop_fwd = drop_fwd + d3
            tok_rows = tok_rows_flat.reshape(k_rows, tok_width, -1)
            tokens_m = slice_of(tokens.reshape(-1), k_rows * tok_width).reshape(
                k_rows, tok_width
            )

        base_rng = jax.random.fold_in(rng, state.step)
        # Distinct dropout streams per device; d_idx*M + m_idx reduces to
        # d_idx at M=1 (bit parity with the pre-tower-sharding chain).
        dropout_rng = jax.random.fold_in(base_rng, d_idx * num_model + m_idx)
        # This peer's rows sit at [m_idx*k, (m_idx+1)*k) of the data
        # shard's block, which starts at d_idx*b_local of the global batch.
        row_offset = d_idx * b_local + m_idx * k_rows
        w_m = slice_of(w, k_rows)

        diff: dict[str, Any] = {"dense": dense, "u_rows": u_rows, "i_rows": i_rows}
        if tokens_m is not None:
            diff["tok_rows"] = tok_rows
        neg_ids = None
        neg_ids_x = None
        my_neg_ids = None
        my_neg_tok_ids = None
        neg_tokens_m = None
        if sample_negs:
            # Shared uniform negatives: base_rng is replicated (no d_idx
            # fold), so every device samples the SAME ids — the exact fold
            # chain the single-device sparse step uses, for bit parity.
            neg_rng = jax.random.fold_in(base_rng, 0x5E9)
            neg_ids = jax.random.randint(
                neg_rng, (num_negs,), 0, num_items, dtype=jnp.int32
            )
            # Exchange-only padding up to a model-axis multiple: pad slots
            # repeat neg_ids[0] (their tower outputs are sliced off after
            # the model-axis output gather; their routed gradients are
            # zero).
            pad = negs_padded - num_negs
            neg_ids_x = (
                jnp.concatenate(
                    [neg_ids, jnp.broadcast_to(neg_ids[:1], (pad,))]
                )
                if pad
                else neg_ids
            )
            neg_rows, my_neg_ids, d4 = gather("item_embedding", neg_ids_x)
            drop_fwd = drop_fwd + d4
            diff["neg_rows"] = neg_rows  # [negs_padded/M, E] per peer
            if item_tok is not None:
                neg_tokens = item_tok[neg_ids_x]  # [negs_padded, T]
                k_neg = negs_padded // num_model
                neg_tok_flat, my_neg_tok_ids, d5 = gather(
                    "text_embedding", neg_tokens.reshape(-1)
                )
                drop_fwd = drop_fwd + d5
                diff["neg_tok_rows"] = neg_tok_flat.reshape(
                    k_neg, tok_width, -1
                )
                neg_tokens_m = slice_of(
                    neg_tokens.reshape(-1), k_neg * tok_width
                ).reshape(k_neg, tok_width)

        def loss_fn(diff):
            dense_p = diff["dense"]
            u_rng, i_rng = jax.random.split(dropout_rng)
            # Towers on this peer's 1/M row slice only.
            u_emb = two_tower.apply_user_tower(
                dense_p, diff["u_rows"], mcfg, train=True, dropout_rng=u_rng
            )
            item_in = diff["i_rows"]
            if "tok_rows" in diff:
                item_in = item_in + two_tower.pool_rows(
                    diff["tok_rows"], tokens_m
                )
            i_emb_m = two_tower.apply_item_tower(
                dense_p, item_in, mcfg, train=True, dropout_rng=i_rng
            )
            neg_emb = None
            if sample_negs:
                # Negatives are shared by every shard: each peer towers its
                # 1/M slice, outputs are reassembled along model, and the
                # exchange-padding slots are sliced off so the loss sees
                # exactly num_negs candidates (single-device parity).
                neg_in = diff["neg_rows"]
                if "neg_tok_rows" in diff:
                    neg_in = neg_in + two_tower.pool_rows(
                        diff["neg_tok_rows"], neg_tokens_m
                    )
                neg_out_m = two_tower.apply_item_tower(
                    dense_p, neg_in, mcfg, train=True, dropout_rng=i_rng
                )
                neg_emb = jax.lax.all_gather(
                    neg_out_m, model_ax, tiled=True, axis=0
                )[:num_negs]
            if uniform:
                # Purely local: each row scores its OWN positive against the
                # shared negatives — positives never leave the peer (the
                # u/i row slices are index-aligned by construction).
                per_ex, correct, raw_diag = uniform_softmax_block(
                    u_emb,
                    i_emb_m,
                    neg_emb,
                    my_ids_i,
                    neg_ids,
                    temperature=rcfg.temperature,
                )
            else:
                # Reassemble the data shard's item COLUMNS from the peers'
                # tower outputs (F-wide; uniform never needs this). The
                # gather's transpose reduce-scatters the column cotangents
                # back to the owning peer.
                i_cols = jax.lax.all_gather(
                    i_emb_m, model_ax, tiled=True, axis=0
                )
                if local_cols:
                    # Shard-local columns: no data-axis all_gather — each
                    # row's in-batch pool is this shard's b_local columns
                    # (offset = m_idx*k within the shard). Column
                    # cotangents stay in the shard by construction, so
                    # there is no data-axis psum-scatter transpose either.
                    v_all, idx_all, w_all = i_cols, ids_i, w
                    offs = m_idx * k_rows
                else:
                    # Item columns for the in-batch loss: the full global
                    # batch. The all_gather's transpose (psum-scatter over
                    # data) sums the column cotangents from every data
                    # shard automatically.
                    v_all = jax.lax.all_gather(i_cols, data_ax, tiled=True, axis=0)
                    idx_all = jax.lax.all_gather(ids_i, data_ax, tiled=True, axis=0)
                    w_all = jax.lax.all_gather(w, data_ax, tiled=True, axis=0)
                    offs = row_offset
                if mixed:
                    per_ex, correct, raw_diag = mixed_softmax_block(
                        u_emb,
                        v_all,
                        idx_all,
                        offs,
                        neg_emb,
                        neg_ids,
                        temperature=rcfg.temperature,
                        log_q=lq if rcfg.logq_correction else None,
                        log_uniform=log_uniform,
                        weights_all=w_all,
                    )
                else:
                    per_ex, correct, raw_diag = loss_block(
                        u_emb,
                        v_all,
                        idx_all,
                        offs,
                        temperature=rcfg.temperature,
                        log_q=lq if rcfg.logq_correction else None,
                        weights_all=w_all,
                    )
            denom = jnp.maximum(jax.lax.psum(jnp.sum(w), data_ax), 1.0)
            num = jnp.sum(per_ex * w_m)
            # This device's SHARE of the global loss: every (data, model)
            # peer owns a distinct k-row block now, so the global weighted
            # mean is the psum of these shares over the COMBINED axis
            # (collective transposes do the cross-shard summing).
            loss_share = num / denom
            if mcfg.l2_regularization > 0:
                # Dense kernels appear once in the global loss -> each of
                # the W peers contributes 1/W; touched rows are per-peer
                # slices, each counted exactly once globally.
                reg = l2_penalty(dense_p, []) / world + l2_penalty(
                    {}, [diff["u_rows"], diff["i_rows"]]
                )
                loss_share = loss_share + mcfg.l2_regularization * reg
            aux = {
                # loss_share includes the l2 term: psum over the combined
                # axis = the global loss exactly as the single-device step
                # reports it.
                "loss_share": loss_share,
                "acc_num": jnp.sum(correct * w_m),
                "logit_num": jnp.sum(raw_diag * w_m),
                "denom": denom,
            }
            return loss_share, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(diff)

        import optax

        # Dense grads: model peers tower DISTINCT row blocks, so the global
        # dense gradient is the psum over the combined axis (was data-only
        # when tower compute was model-replicated). mesh.dense_grad_dtype
        # = bfloat16 halves the ring-all-reduce bytes (the pod dossier's
        # second-largest term); Adam still updates in f32.
        def _dense_psum(g):
            if grad_dtype is not None:
                g = g.astype(grad_dtype)
            return jax.lax.psum(g, comb).astype(jnp.float32)

        dense_g = jax.tree_util.tree_map(_dense_psum, grads["dense"])
        updates, new_opt = optimizer.update(dense_g, state.opt_state, dense)
        new_dense = optax.apply_updates(dense, updates)

        step_num = state.step + 1
        lr = lr_fn(state.step)

        def route_update(name, my_ids, my_grads):
            """Each peer routes the row grads of ITS tower slice exactly
            once; owners dedup + lazy-Adam their rows."""
            k = my_ids.shape[0]
            nt, nmo, nsq, drop = alltoall_row_update(
                tables[name],
                state.table_state[name]["moments"],
                my_ids,
                my_grads,
                axis_name=comb,
                capacity=_capacity(k, world, cap_factor),
                lr=lr,
                step=step_num,
            )
            return nt, nmo, jax.lax.psum(nsq, comb), drop

        item_route_ids = my_ids_i
        item_route_grads = grads["i_rows"]
        if sample_negs:
            # Each peer's neg-slice grads are its own distinct share (the
            # output gather's reduce-scatter already summed the cross-peer
            # cotangents), so every (shard, id) contribution is routed
            # exactly once; the owner-side dedup sums the per-shard shares.
            # Padded slots carry zero gradients (the loss never saw them).
            item_route_ids = jnp.concatenate([my_ids_i, my_neg_ids])
            item_route_grads = jnp.concatenate(
                [grads["i_rows"], grads["neg_rows"]]
            )
        row_work = {
            "user_embedding": (my_ids_u, grads["u_rows"]),
            "item_embedding": (item_route_ids, item_route_grads),
        }
        if tokens_m is not None:
            tok_route_ids = tokens_m.reshape(-1)
            tok_route_grads = grads["tok_rows"].reshape(
                k_rows * tok_width, -1
            )
            if sample_negs and "neg_tok_rows" in grads:
                k_neg = negs_padded // num_model
                tok_route_ids = jnp.concatenate(
                    [tok_route_ids, neg_tokens_m.reshape(-1)]
                )
                tok_route_grads = jnp.concatenate(
                    [
                        tok_route_grads,
                        grads["neg_tok_rows"].reshape(k_neg * tok_width, -1),
                    ]
                )
            row_work["text_embedding"] = (tok_route_ids, tok_route_grads)
        new_tables = dict(tables)
        new_tstate = {k: dict(v) for k, v in state.table_state.items()}
        tbl_norm_sq = jnp.asarray(0.0, jnp.float32)
        drop_bwd = jnp.int32(0)
        for name, (fids, fgrads) in row_work.items():
            nt, nmo, nsq, drop = route_update(name, fids, fgrads)
            new_tables[name] = nt
            new_tstate[name] = {"moments": nmo}
            tbl_norm_sq = tbl_norm_sq + nsq
            drop_bwd = drop_bwd + drop

        denom = aux["denom"]
        metrics = {
            "loss": jax.lax.psum(aux["loss_share"], comb),
            "accuracy": jax.lax.psum(aux["acc_num"], comb) / denom,
            "logits_mean": jax.lax.psum(aux["logit_num"], comb) / denom,
            "grad_norm": jnp.sqrt(
                optax.global_norm(dense_g) ** 2 + tbl_norm_sq
            ),
            "dropped_ids": jax.lax.psum(
                (drop_fwd + drop_bwd).astype(jnp.float32), comb
            ),
        }
        new_state = TrainState(
            step=step_num,
            params={**new_tables, **new_dense},
            opt_state=new_opt,
            table_state=new_tstate,
        )
        return new_state, metrics

    # --- specs + jit -------------------------------------------------------
    st_spec = state_pspecs(state_template, mesh_cfg, sparse_mesh=True)
    batch_spec = {k: P(data_ax) for k in ("user_idx", "item_idx", "weight")}
    fixed = {}
    rep = NamedSharding(mesh, P())
    if log_q is not None:
        fixed["log_q"] = jax.device_put(jnp.asarray(log_q, jnp.float32), rep)
    if item_tokens is not None:
        fixed["item_tokens"] = jax.device_put(jnp.asarray(item_tokens), rep)
    fixed_spec = {k: P() for k in fixed}
    metrics_spec = {
        "loss": P(), "accuracy": P(), "logits_mean": P(),
        "grad_norm": P(), "dropped_ids": P(),
    }

    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(st_spec, batch_spec, P(), fixed_spec),
        out_specs=(st_spec, metrics_spec),
        check_rep=False,
    )
    if return_raw:
        return mapped, fixed, st_spec, metrics_spec
    jitted = jax.jit(mapped, donate_argnums=(0,) if donate else ())

    def step(state, batch, rng):
        return jitted(state, batch, rng, fixed)

    return step

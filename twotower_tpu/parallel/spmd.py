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


def make_mesh_loss(mesh: Mesh, config: Config, *, force_pallas: bool | None = None):
    """In-batch loss for the dense GSPMD step as a ``shard_map`` island.

    GSPMD cannot auto-partition a ``pallas_call``; this wrapper restores the
    fused Pallas kernel on multi-device meshes by computing each data
    shard's ``[B/D, B]`` score block locally (item columns all-gathered
    along ``data``) and returning the PER-EXAMPLE values sharded over
    ``data`` — the weighted reduction happens outside the island, and the
    block kernel's custom VJP plus the all_gather transpose produce the
    correct distributed backward (golden-tested vs the XLA loss in
    tests/test_parallel.py).

    ``force_pallas``: ``None`` auto-selects (Pallas on TPU when the block
    shape is supported, XLA block otherwise); tests pass True/False.
    """
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from twotower_tpu.ops import pallas_kernels
    from twotower_tpu.ops.dispatch import pallas_enabled
    from twotower_tpu.ops.losses import in_batch_softmax_block

    data_ax = config.mesh.data_axis
    num_data = mesh.shape[data_ax]

    def loss(user_emb, item_emb, item_idx, *, temperature, log_q=None, weights=None):
        batch = user_emb.shape[0]
        rows_local = batch // num_data
        dim = user_emb.shape[1]
        if force_pallas is None:
            use_pallas = (
                pallas_enabled()
                and jax.default_backend() == "tpu"
                and pallas_kernels.supported_block(rows_local, batch, dim)
            )
        else:
            use_pallas = force_pallas
        block = (
            pallas_kernels.fused_in_batch_softmax_block
            if use_pallas
            else in_batch_softmax_block
        )
        w = weights if weights is not None else jnp.ones((batch,), jnp.float32)
        args = [user_emb, item_emb, item_idx, w]
        specs = [P(data_ax, None), P(data_ax, None), P(data_ax), P(data_ax)]
        if log_q is not None:
            args.append(log_q)
            specs.append(P())

        def body(u_loc, v_loc, idx_loc, w_loc, *rest):
            lq = rest[0] if rest else None
            d = jax.lax.axis_index(data_ax)
            v_all = jax.lax.all_gather(v_loc, data_ax, tiled=True, axis=0)
            idx_all = jax.lax.all_gather(idx_loc, data_ax, tiled=True, axis=0)
            w_all = jax.lax.all_gather(w_loc, data_ax, tiled=True, axis=0)
            return block(
                u_loc,
                v_all,
                idx_all,
                d * rows_local,
                temperature=temperature,
                log_q=lq,
                weights_all=w_all if weights is not None else None,
            )

        per_example, correct, raw_diag = shard_map(
            body,
            mesh=mesh,
            in_specs=tuple(specs),
            out_specs=(P(data_ax),) * 3,
            check_rep=False,
        )(*args)

        wf = w.astype(jnp.float32)
        denom = jnp.maximum(wf.sum(), 1.0)
        loss_val = (per_example * wf).sum() / denom
        metrics = {
            "accuracy": (correct * wf).sum() / denom,
            "logits_mean": (raw_diag * wf).sum() / denom,
        }
        return loss_val, metrics

    return loss


def _build_mesh_step(
    config: Config,
    optimizer,
    mesh: Mesh,
    state_template: TrainState,
    *,
    log_q: Any = None,
    item_tokens: Any = None,
    num_items: int | None = None,
):
    """Shared sparse/dense dispatch for the host-loop step and the
    device-resident epoch (the single place the rule lives — both public
    builders embed what this returns).

    Returns ``(raw, fixed, st_sh, sparse)``: an unjitted
    ``raw(state, batch, rng, fixed)`` step, its replicated device-resident
    side inputs (``log_q`` / ``item_tokens``), the state shardings, and
    whether the sparse path was selected.

    Dispatch: when the config enables sparse table updates (and the model/
    sampling combination supports them — ``use_sparse_mesh_path``), the
    shard_map-based sparse step (parallel/sparse_spmd.py: a2a lookups +
    distributed gradient scatter, tables sharded over the combined mesh);
    otherwise the dense GSPMD step. GSPMD cannot auto-partition
    ``pallas_call``, so on a multi-device dense mesh the fused loss is
    injected as a shard_map island (``make_mesh_loss``) when the per-shard
    block shape is supported; the single-device mesh keeps the plain
    dispatcher.
    """
    import jax.numpy as jnp

    from twotower_tpu.parallel.sparse_spmd import (
        make_sparse_sharded_train_step,
        use_sparse_mesh_path,
    )

    rep = replicated(mesh)
    if use_sparse_mesh_path(config):
        if state_template.table_state is None:
            raise ValueError(
                "config enables sparse mesh training but the state has no "
                "table_state — build it with TrainState.for_config and shard "
                "with state_shardings(..., sparse_mesh=True)"
            )
        raw, fixed, _, _ = make_sparse_sharded_train_step(
            config,
            optimizer,
            mesh,
            state_template,
            log_q,
            item_tokens=item_tokens,
            num_items=num_items,
            return_raw=True,
        )
        # Same spec source as the step's shard_map (state_pspecs with
        # sparse_mesh=True), via the one shared spec->sharding mapper.
        st_sh = state_shardings(mesh, state_template, config.mesh, sparse_mesh=True)
        return raw, fixed, st_sh, True

    mesh_loss = None
    if mesh.devices.size > 1 and config.retrieval.candidate_sampling == "in_batch":
        mesh_loss = make_mesh_loss(mesh, config)
    step5 = make_step_fn(
        config,
        optimizer,
        allow_pallas=mesh.devices.size == 1,
        num_items=num_items,
        loss_impl=mesh_loss,
    )
    st_sh = state_shardings(mesh, state_template, config.mesh)
    fixed = {}
    if log_q is not None:
        fixed["log_q"] = jax.device_put(jnp.asarray(log_q, jnp.float32), rep)
    if item_tokens is not None:
        fixed["item_tokens"] = jax.device_put(jnp.asarray(item_tokens), rep)

    def raw(state, batch, rng, fx):
        return step5(state, batch, rng, fx.get("log_q"), fx.get("item_tokens"))

    return raw, fixed, st_sh, False


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
    ``data``, and replicated metrics out. Sparse/dense dispatch lives in
    ``_build_mesh_step`` (shared with ``make_sharded_epoch_fn``).
    """
    raw, fixed, st_sh, sparse = _build_mesh_step(
        config,
        optimizer,
        mesh,
        state_template,
        log_q=log_q,
        item_tokens=item_tokens,
        num_items=num_items,
    )
    if sparse:
        # shard_map body: specs are carried by the shard_map itself.
        jitted = jax.jit(raw, donate_argnums=(0,) if donate else ())
    else:
        b_sh = batch_shardings(mesh, config.mesh)
        rep = replicated(mesh)
        metrics_sh = {
            "accuracy": rep,
            "logits_mean": rep,
            "loss": rep,
            "grad_norm": rep,
        }
        jitted = jax.jit(
            raw,
            in_shardings=(
                st_sh,
                {"user_idx": b_sh, "item_idx": b_sh, "weight": b_sh},
                rep,
                {k: rep for k in fixed},
            ),
            out_shardings=(st_sh, metrics_sh),
            donate_argnums=(0,) if donate else (),
        )

    def step(state, batch, rng):
        return jitted(state, batch, rng, fixed)

    return step


def make_sharded_epoch_fn(
    config: Config,
    optimizer,
    mesh: Mesh,
    state_template: TrainState,
    num_steps: int,
    *,
    num_items: int | None = None,
    log_q: Any = None,
    item_tokens: Any = None,
    donate: bool = True,
):
    """Device-resident epoch program ON THE MESH: shuffle + ``num_steps``
    sharded train steps under one jit (``training.device_loop`` semantics,
    SPMD execution).

    The host dispatches once per epoch; inside, a replicated on-device
    permutation selects each step's batch from the replicated interaction
    columns (int32 ids — a 50M-interaction epoch is ~600 MB/device), and the
    per-step program is the SAME sharded step the host-loop mesh Trainer
    runs: the shard_map sparse step (a2a lookups + distributed row scatter,
    ``sparse_spmd``) when the config enables sparse updates, otherwise the
    dense GSPMD step with the shard_map loss island. State stays sharded
    across the scan carry; per-step metrics return as epoch means.

    Single-controller meshes only: every process would need the full column
    set, so multi-host runs should use the host-loop Trainer's per-process
    input path instead.

    Returns ``epoch_fn(state, columns, epoch_rng) -> (state, metrics)``.
    """
    import jax.numpy as jnp

    batch_size = config.training.batch_size
    rep = replicated(mesh)
    step, fixed, st_sh, _sparse = _build_mesh_step(
        config,
        optimizer,
        mesh,
        state_template,
        log_q=log_q,
        item_tokens=item_tokens,
        num_items=num_items,
    )

    def epoch_raw(state, columns, epoch_rng, fx):
        n = columns["user_idx"].shape[0]
        perm = jax.random.permutation(epoch_rng, n)

        def body(state, i):
            sel = jax.lax.dynamic_slice(perm, (i * batch_size,), (batch_size,))
            batch = {k: v[sel] for k, v in columns.items()}
            state, metrics = step(state, batch, epoch_rng, fx)
            return state, metrics

        state, stacked = jax.lax.scan(
            body, state, jnp.arange(num_steps, dtype=jnp.int32)
        )
        return state, {k: v.mean() for k, v in stacked.items()}

    cols_sh = {k: rep for k in ("user_idx", "item_idx", "weight")}
    jitted = jax.jit(
        epoch_raw,
        in_shardings=(st_sh, cols_sh, rep, {k: rep for k in fixed}),
        out_shardings=(st_sh, None),
        donate_argnums=(0,) if donate else (),
    )

    def epoch_fn(state, columns, epoch_rng):
        return jitted(state, columns, epoch_rng, fixed)

    return epoch_fn


def make_sharded_eval_step(
    config: Config,
    mesh: Mesh,
    num_items: int,
    max_k: int,
    *,
    item_tokens: Any = None,
):
    """Mesh-wide corpus encode + top-k + metrics.

    The encoded corpus genuinely STAYS row-sharded ``P(model, None)`` — each
    device holds ``padded_items / num_model`` rows, never the full matrix
    (at 10M items x 128 f32 dims the replicated alternative costs ~5 GB of
    HBM per device during every validation pass; docs/evaluation.md has the
    table). Queries split over ``data``; each device searches its local
    corpus shard and the per-shard candidates merge exactly over the model
    axis (``ops.topk.topk_mips_sharded`` — the same cross-shard merge
    serving uses), with metric SUMS psummed over ``data`` to replicated
    scalars, so every process sees identical metrics (multi-host early
    stopping agrees by construction).

    ``retrieval.eval_exact=false`` swaps in the per-shard
    ``approx_max_k`` search (``topk_mips_approx_sharded``) for fast
    validation at large corpora; final test evals should stay exact.
    """
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from twotower_tpu.evaluation.metrics import rank_of_true_item
    from twotower_tpu.models import two_tower
    from twotower_tpu.ops.topk import topk_mips_approx_sharded, topk_mips_sharded

    mcfg = config.model
    mesh_cfg = config.mesh
    data_ax, model_ax = mesh_cfg.data_axis, mesh_cfg.model_axis
    num_model = mesh.shape[model_ax]
    # `or (max_k,)`: same tiny-corpus fallback as the replicated evaluator
    # (evaluation/evaluator.py) — switching --mesh on must never change the
    # metrics dict's keys.
    ks = tuple(
        k for k in sorted(config.retrieval.top_k_eval) if k <= max_k
    ) or (max_k,)
    rep = replicated(mesh)
    b_sh = batch_shardings(mesh, mesh_cfg)
    corpus_sh = NamedSharding(mesh, P(model_ax, None))
    # Equal shards need padding; pad rows are masked inside the local search
    # (num_items bound), so they can never displace real candidates. Large
    # exact-mode shards additionally align to the max scan chunk (131072,
    # a multiple of every power-of-two auto chunk) so the per-shard search
    # never re-pads a multi-GB shard inside the per-batch jit — the same
    # pre-pad-once rule the replicated Evaluator applies.
    local_rows = -(-num_items // num_model)
    exact = config.retrieval.eval_exact
    if exact and local_rows >= 131072:
        local_rows = -(-local_rows // 131072) * 131072
    padded_items = local_rows * num_model
    tokens = jnp.asarray(item_tokens) if item_tokens is not None else None

    def encode_corpus(params):
        full = two_tower.embed_item_table(
            params, mcfg, num_items, item_tokens=tokens
        ).astype(config.retrieval.eval_corpus_jnp_dtype())
        return jnp.pad(full, ((0, padded_items - num_items), (0, 0)))

    def body(u_loc, corpus_shard, t_loc, w_loc):
        if exact:
            # chunk_size=None -> ops.topk.exact_scan_chunk auto sizing
            # (one shared formula; power-of-two, so it divides the
            # 131072-aligned shard above).
            _, topk_idx = topk_mips_sharded(
                u_loc, corpus_shard, max_k,
                axis_name=model_ax, num_items=num_items,
            )
        else:
            _, topk_idx = topk_mips_approx_sharded(
                u_loc, corpus_shard, max_k,
                axis_name=model_ax, num_items=num_items,
                recall_target=config.serving.recall_target,
            )
        rank = rank_of_true_item(topk_idx, t_loc)
        w = w_loc.astype(jnp.float32)
        gain = 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0)
        sums: dict[str, Any] = {}
        for k in ks:
            hit = (rank < k).astype(jnp.float32)
            sums[f"recall@{k}"] = (hit * w).sum()
            sums[f"ndcg@{k}"] = (hit * gain * w).sum()
        sums["mrr"] = (
            (rank < max_k).astype(jnp.float32)
            / (rank.astype(jnp.float32) + 1.0)
            * w
        ).sum()
        sums["_weight"] = w.sum()
        # Sum over data shards; model peers compute identical values (the
        # cross-shard merge all-gathers along model), so no model reduction.
        return {k: jax.lax.psum(v, data_ax) for k, v in sums.items()}

    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_ax, None), P(model_ax, None), P(data_ax), P(data_ax)),
        out_specs={f"recall@{k}": P() for k in ks}
        | {f"ndcg@{k}": P() for k in ks}
        | {"mrr": P(), "_weight": P()},
        check_rep=False,
    )

    def eval_batch(params, corpus, user_idx, true_item, weight):
        # Query tower outside the shard_map: GSPMD handles the (possibly
        # model-sharded) user-table gather; the island only sees [B, D].
        user_emb = two_tower.embed_users(params, user_idx, mcfg, train=False)
        sums = mapped(user_emb, corpus, true_item, weight)
        denom = jnp.maximum(sums["_weight"], 1.0)
        return {k: v / denom for k, v in sums.items() if k != "_weight"}

    encode = jax.jit(encode_corpus, out_shardings=corpus_sh)
    evalb = jax.jit(
        eval_batch,
        in_shardings=(None, corpus_sh, b_sh, b_sh, b_sh),
        out_shardings={f"recall@{k}": rep for k in ks}
        | {f"ndcg@{k}": rep for k in ks}
        | {"mrr": rep},
    )
    return encode, evalb

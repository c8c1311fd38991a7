"""Jitted train step + epoch loop with early stopping.

Realizes the reference's declared training capability (reference:
README.md:17,39; pyproject.toml:67; configs/data_config.yaml:61-66 — batch
1024, lr 1e-3, 50 epochs, patience 5, validation_freq 1) as a TPU-native
loop: one compiled SPMD step function (traced once — static shapes from the
fixed-shape batch pipeline), async dispatch with metrics fetched off-step,
and host-side early stopping on a validation retrieval metric.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from twotower_tpu.config import Config
from twotower_tpu.logging_utils import get_logger
from twotower_tpu.models import two_tower
from twotower_tpu.ops.dispatch import in_batch_softmax_loss_auto
from twotower_tpu.ops.losses import in_batch_softmax_loss, l2_penalty
from twotower_tpu.training.state import TrainState, make_optimizer

logger = get_logger(__name__)

Array = jax.Array
Batch = dict[str, Array]
TrainStepFn = Callable[[TrainState, Batch, Array], tuple[TrainState, dict[str, Array]]]


def make_loss_fn(
    config: Config,
    *,
    allow_pallas: bool = True,
    num_items: int | None = None,
    loss_impl: Callable | None = None,
):
    """Build ``loss_fn(params, batch, dropout_rng, log_q, item_tokens)``.

    ``log_q`` / ``item_tokens`` are ARGUMENTS, not closures: closure-captured
    device arrays become XLA constants that some runtimes (notably the
    tunneled axon backend) re-ship on every execute — measured at ~1.4 ms per
    captured MB-sized array per step.

    ``allow_pallas=False`` forces the XLA loss — required under a multi-device
    mesh, where GSPMD cannot auto-partition a ``pallas_call`` (the sharded
    path sets this; see parallel/spmd.py). ``item_tokens``: optional
    ``[num_items, T]`` hashed text table enabling the item text tower.
    """
    mcfg = config.model
    rcfg = config.retrieval

    def loss_fn(
        params,
        batch: Batch,
        dropout_rng: Array,
        log_q: Array | None = None,
        item_tokens: Array | None = None,
    ):
        u_rng, i_rng = jax.random.split(dropout_rng)
        user_emb = two_tower.embed_users(
            params, batch["user_idx"], mcfg, train=True, dropout_rng=u_rng
        )
        tokens = (
            item_tokens[batch["item_idx"]] if item_tokens is not None else None
        )
        item_emb = two_tower.embed_items(
            params, batch["item_idx"], mcfg, train=True, dropout_rng=i_rng,
            text_tokens=tokens,
        )
        if rcfg.candidate_sampling in ("uniform", "mixed"):
            if num_items is None:
                raise ValueError(
                    f"{rcfg.candidate_sampling} candidate sampling needs "
                    "num_items (pass it to make_train_step / the Trainer)"
                )
            from twotower_tpu.ops.losses import (
                mixed_sampled_softmax_loss,
                uniform_sampled_softmax_loss,
            )

            neg_rng = jax.random.fold_in(dropout_rng, 0x5e9)
            neg_ids = jax.random.randint(
                neg_rng, (rcfg.num_negatives,), 0, num_items, dtype=jnp.int32
            )
            neg_tokens = (
                item_tokens[neg_ids] if item_tokens is not None else None
            )
            neg_emb = two_tower.embed_items(
                params, neg_ids, mcfg, train=True, dropout_rng=i_rng,
                text_tokens=neg_tokens,
            )
            if rcfg.candidate_sampling == "mixed":
                loss, metrics = mixed_sampled_softmax_loss(
                    user_emb,
                    item_emb,
                    batch["item_idx"],
                    neg_emb,
                    neg_ids,
                    temperature=rcfg.temperature,
                    log_q=log_q if rcfg.logq_correction else None,
                    num_items=num_items,
                    weights=batch.get("weight"),
                )
            else:
                loss, metrics = uniform_sampled_softmax_loss(
                    user_emb,
                    item_emb,
                    neg_emb,
                    temperature=rcfg.temperature,
                    weights=batch.get("weight"),
                    pos_idx=batch["item_idx"],
                    neg_idx=neg_ids,
                )
        else:
            impl = loss_impl or (
                in_batch_softmax_loss_auto if allow_pallas else in_batch_softmax_loss
            )
            loss, metrics = impl(
                user_emb,
                item_emb,
                batch["item_idx"],
                temperature=rcfg.temperature,
                log_q=log_q if rcfg.logq_correction else None,
                weights=batch.get("weight"),
            )
        if mcfg.l2_regularization > 0:
            reg = l2_penalty(
                {"user_tower": params["user_tower"], "item_tower": params["item_tower"]},
                two_tower.gathered_embeddings(
                    params, batch["user_idx"], batch["item_idx"]
                ),
            )
            loss = loss + mcfg.l2_regularization * reg
        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def make_step_fn(
    config: Config,
    optimizer: optax.GradientTransformation,
    *,
    allow_pallas: bool = True,
    num_items: int | None = None,
    loss_impl: Callable | None = None,
) -> TrainStepFn:
    """The un-jitted step ``(state, batch, rng, log_q=None, item_tokens=None)``:
    grad -> optimizer update -> new state. Shared by the single-chip path
    (``make_train_step``) and the mesh path
    (``parallel.spmd.make_sharded_train_step``). ``loss_impl`` overrides the
    in-batch loss implementation (the mesh path injects a shard_map-wrapped
    Pallas block loss — ``parallel.spmd.make_mesh_loss``)."""
    loss_fn = make_loss_fn(
        config, allow_pallas=allow_pallas, num_items=num_items, loss_impl=loss_impl
    )

    def step(
        state: TrainState,
        batch: Batch,
        rng: Array,
        log_q: Array | None = None,
        item_tokens: Array | None = None,
    ):
        dropout_rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_rng, log_q, item_tokens
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_train_step(
    config: Config,
    optimizer: optax.GradientTransformation,
    log_q: Array | None = None,
    *,
    donate: bool = True,
    item_tokens: Array | None = None,
    num_items: int | None = None,
) -> TrainStepFn:
    """Build the jitted train step ``(state, batch, rng)``. ``state`` is
    donated so XLA updates params/opt-state in place (no HBM copy per step).
    Dispatches to the sparse-table path when ``training.sparse_table_updates``
    is set. ``log_q``/``item_tokens`` are bound as device-resident jit
    ARGUMENTS (see make_loss_fn docstring for why closures are poison)."""
    if config.training.effective_sparse_updates():
        from twotower_tpu.training.sparse import make_sparse_step_fn

        raw = make_sparse_step_fn(config, optimizer, num_items=num_items)
    else:
        raw = make_step_fn(config, optimizer, num_items=num_items)
    jitted = jax.jit(raw, donate_argnums=(0,) if donate else ())
    lq = jnp.asarray(log_q, jnp.float32) if log_q is not None else None
    tok = jnp.asarray(item_tokens) if item_tokens is not None else None

    def step(state: TrainState, batch: Batch, rng: Array):
        return jitted(state, batch, rng, lq, tok)

    return step


def make_segment_runner(
    config: Config,
    optimizer: optax.GradientTransformation,
    log_q: Array | None = None,
    *,
    item_tokens: Array | None = None,
    num_items: int | None = None,
):
    """Jitted multi-step dispatch: ``runner(state, batches, rng)`` scans the
    train step over ``batches`` — a batch dict whose arrays carry a leading
    segment axis ``[S, B, ...]`` — and returns ``(state, mean metrics)``.

    This is the streamed-input counterpart of ``training/device_loop.py``:
    the input pipeline stays out-of-core (bounded host memory), but the
    device sees ONE dispatch per S steps instead of per step, amortizing
    the per-step host/transport overhead that bounds streamed wall rate on
    a high-latency link (see ``TrainingConfig.segment_steps``). Distinct
    segment lengths (the epoch tail) retrace automatically. Metrics come
    back as means over the segment (``dropped_ids > 0`` detection is
    preserved — a positive per-step count stays positive in the mean).
    """
    if config.training.effective_sparse_updates():
        from twotower_tpu.training.sparse import make_sparse_step_fn

        raw = make_sparse_step_fn(config, optimizer, num_items=num_items)
    else:
        raw = make_step_fn(config, optimizer, num_items=num_items)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_segment(state, batches, rng, log_q, item_tokens):
        def body(st, b):
            return raw(st, b, rng, log_q, item_tokens)

        state, stacked = jax.lax.scan(body, state, batches)
        return state, {k: v.mean() for k, v in stacked.items()}

    lq = jnp.asarray(log_q, jnp.float32) if log_q is not None else None
    tok = jnp.asarray(item_tokens) if item_tokens is not None else None

    def runner(state, batches: Batch, rng: Array):
        return run_segment(state, batches, rng, lq, tok)

    return runner


def pack_segments(batches, segment_steps: int):
    """Group an epoch's batch dicts into stacked ``[S, ...]`` segment dicts
    (host-side, runs on the prefetch thread). The final segment carries the
    epoch remainder (shorter leading axis)."""
    buf: list[Batch] = []
    for b in batches:
        buf.append(b)
        if len(buf) == segment_steps:
            yield {k: np.stack([x[k] for x in buf]) for k in buf[0]}
            buf = []
    if buf:
        yield {k: np.stack([x[k] for x in buf]) for k in buf[0]}


def ensure_final_persisted(manager, state, stopper: "EarlyStopping", *, epoch: int) -> None:
    """Async save-starvation backstop (round-4 incident): when saves are
    slower than the improvement cadence, every improving-epoch save after
    the first gets busy-skipped and the newest durable checkpoint can be
    MANY epochs behind the best validation (a 50M device-loop run ended
    with only epoch 0 on disk while the summary claimed the epoch-13
    best). After the final flush, if the newest durable step predates the
    best validation step, persist the FINAL state — not bit-identical to
    the best epoch's params, but within the early-stopping patience of it,
    and categorically better than an epoch-0 artifact — then flush again.
    """
    if manager is None:
        return
    latest = manager.latest_step()
    if stopper.best_step and (latest is None or latest < stopper.best_step):
        logger.warning(
            "async checkpoint starvation: newest durable checkpoint (step "
            "%s) predates the best validation (step %d); persisting the "
            "final state (step %d)", latest, stopper.best_step,
            int(state.step),
        )
        manager.save(
            int(state.step), state,
            metrics={"best_val_at_stop": stopper.best},
            extra={"epoch": epoch, "post_starvation_final": True},
            force=True,
        )
        manager.flush()


def warn_dropped_ids(host: dict, *, epoch: int, step: int) -> None:
    """Surface a2a capacity overflow as an operator WARNING, not just a
    metric (VERDICT r03 UX): dropped ids mean ``mesh.a2a_capacity_factor``
    is sized too tight for this batch distribution — those rows read zeros
    and their gradients are lost, silently degrading training quality."""
    dropped = host.get("dropped_ids", 0.0)
    if dropped and dropped > 0:
        logger.warning(
            "epoch %d step %d: a2a capacity overflow — %d embedding ids "
            "dropped (read zeros / gradients lost); raise "
            "mesh.a2a_capacity_factor (0 disables capacity limiting)",
            epoch, step, int(dropped),
        )


@dataclass
class EarlyStopping:
    """Patience-based early stopping on a maximized metric
    (reference schema: ``early_stopping_patience: 5``,
    configs/data_config.yaml:65)."""

    patience: int
    best: float = -np.inf
    best_step: int = 0
    bad_rounds: int = 0

    def update(self, value: float, step: int) -> bool:
        """Record a validation metric; returns True if training should stop."""
        if value > self.best:
            self.best = value
            self.best_step = step
            self.bad_rounds = 0
            return False
        self.bad_rounds += 1
        # Keras/TFRS convention: stop after exactly `patience` consecutive
        # non-improving validations (reference schema patience 5).
        return self.bad_rounds >= self.patience


@dataclass
class TrainResult:
    state: TrainState
    history: list[dict[str, float]] = field(default_factory=list)
    best_metric: float = -np.inf
    best_step: int = 0
    # End-to-end: examples / total wall time in fit() — includes first-step
    # compilation, validation and checkpoint saves. The honest "how long did
    # training take" number.
    examples_per_sec: float = 0.0
    # Training-phase only: examples / time inside the epoch loops (eval and
    # checkpointing excluded; compile still included in epoch 0).
    train_examples_per_sec: float = 0.0
    # Steady state: the fastest single epoch — what the pipeline sustains
    # once compilation is amortized. This is the number to compare against
    # device-capability benchmarks (bench.py).
    steady_examples_per_sec: float = 0.0

    def finalize_throughput(self, examples_seen: int, train_time: float, total_time: float) -> None:
        self.examples_per_sec = examples_seen / max(total_time, 1e-9)
        self.train_examples_per_sec = examples_seen / max(train_time, 1e-9)
        self.steady_examples_per_sec = max(
            (r["examples_per_sec"] for r in self.history if "examples_per_sec" in r),
            default=self.train_examples_per_sec,
        )


class Trainer:
    """Epoch-driving host loop around the compiled step.

    ``evaluate_fn(params) -> dict`` supplies validation metrics (typically
    from ``evaluation.Evaluator``); ``writers`` receive per-step and
    per-epoch metric dicts (see ``utils/tracking.py``).
    """

    def __init__(
        self,
        config: Config,
        *,
        log_q: np.ndarray | None = None,
        evaluate_fn: Callable[[Any], dict[str, float]] | None = None,
        writers: list[Any] | None = None,
        checkpoint_manager: Any | None = None,
        shutdown: Any | None = None,
        item_tokens: np.ndarray | None = None,
        mesh: Any | None = None,
        num_items: int | None = None,
        text_embedding_init: np.ndarray | None = None,
    ):
        self.config = config
        self.optimizer = make_optimizer(config.training)
        self.log_q = jnp.asarray(log_q, jnp.float32) if log_q is not None else None
        self.mesh = mesh
        self.num_items = num_items
        self._item_tokens = item_tokens
        self._text_embedding_init = text_embedding_init
        if mesh is not None:
            # Sharded step is built lazily in fit() — it needs the state
            # pytree structure for sharding inference.
            self.train_step = None
        else:
            self.train_step = make_train_step(
                config, self.optimizer, self.log_q, item_tokens=item_tokens,
                num_items=num_items,
            )
        self.evaluate_fn = evaluate_fn
        self.writers = writers or []
        self.checkpoint_manager = checkpoint_manager
        # Preemption-aware stop flag provider (utils.profiling.GracefulShutdown).
        self.shutdown = shutdown
        # Built lazily in fit() when training.segment_steps > 1.
        self._segment_run = None

    def init_state(self, num_users: int, num_items: int) -> TrainState:
        from twotower_tpu.training.state import init_train_state

        return init_train_state(
            self.config, self.optimizer, num_users, num_items, mesh=self.mesh,
            text_embedding_init=self._text_embedding_init,
        )

    def _ensure_step(self, state: TrainState) -> None:
        if self.train_step is None:
            from twotower_tpu.parallel.spmd import make_sharded_train_step

            self.train_step = make_sharded_train_step(
                self.config, self.optimizer, self.mesh, state, self.log_q,
                item_tokens=self._item_tokens, num_items=self.num_items,
            )
            from twotower_tpu.parallel.sharding import batch_shardings

            self._batch_sharding = batch_shardings(self.mesh, self.config.mesh)

    def _write(self, payload: dict[str, float], step: int) -> None:
        for w in self.writers:
            w.write(payload, step=step)

    def fit(self, state: TrainState, pipeline, *, start_epoch: int = 0) -> TrainResult:
        from twotower_tpu.utils.profiling import StepTimer

        cfg = self.config.training
        rng = jax.random.PRNGKey(cfg.seed + 1)
        stopper = EarlyStopping(patience=cfg.patience)
        result = TrainResult(state=state)
        examples_seen = 0
        t_start = time.perf_counter()
        pending: dict[str, Array] | None = None
        timer = StepTimer()
        self._ensure_step(state)
        if self.mesh is not None:
            from twotower_tpu.parallel.sharding import replicated

            rng = jax.device_put(rng, replicated(self.mesh))

        from twotower_tpu.data.pipeline import DevicePrefetcher

        if self.mesh is not None:
            b_sh = self._batch_sharding
            global_rows = self.config.training.batch_size

            def to_device(b):
                # Multi-host-correct batch assembly: each process supplies
                # ONLY its addressable slice (BatchPipeline host_shard) and
                # the runtime assembles the global sharded array — no
                # process ever holds the global batch. Single-process this
                # reduces to a plain sharded device_put.
                return {
                    k: jax.make_array_from_process_local_data(
                        b_sh, np.asarray(v), (global_rows,) + np.shape(v)[1:]
                    )
                    for k, v in b.items()
                }
        else:

            def to_device(b):
                return {k: jnp.asarray(v) for k, v in b.items()}

        # Host-side dedup precompute (training/host_dedup.py): ship per-batch
        # unique-id segments so the device step skips its argsort+segment
        # dedup (−7.2% step time measured). Single-device sparse path only.
        from twotower_tpu.training.host_dedup import augment_epoch, wants_host_dedup

        dedup_deads: tuple[int, int | None] | None = None
        if wants_host_dedup(self.config, self.mesh):
            from twotower_tpu.models.two_tower import dead_row

            item_dead = (
                dead_row(state.params["item_embedding"])
                if self.config.retrieval.candidate_sampling == "in_batch"
                else None
            )
            dedup_deads = (dead_row(state.params["user_embedding"]), item_dead)

        def epoch_batches(epoch: int):
            it = pipeline.epoch(epoch)
            if dedup_deads is not None:
                it = augment_epoch(
                    it, user_dead=dedup_deads[0], item_dead=dedup_deads[1]
                )
            return it

        # Segmented dispatch (training.segment_steps > 1): scan S stacked
        # batches per device call — streamed input with device-loop-like
        # dispatch amortization. Single-device host loop only (the mesh
        # path's per-process batch assembly is per-step by construction).
        seg = cfg.segment_steps if self.mesh is None else 0
        if cfg.segment_steps > 1 and self.mesh is not None:
            logger.warning(
                "training.segment_steps=%d ignored on the mesh path "
                "(per-step multi-host batch assembly); use --device-loop "
                "for device-resident mesh epochs", cfg.segment_steps,
            )
        if seg > 1 and self._segment_run is None:
            self._segment_run = make_segment_runner(
                self.config, self.optimizer, self.log_q,
                item_tokens=self._item_tokens, num_items=self.num_items,
            )

        train_time = 0.0
        for epoch in range(start_epoch, cfg.epochs):
            t_epoch = time.perf_counter()
            steps = 0
            # Background host->device prefetch: input transfer overlaps the
            # previous step's device execution.
            if seg > 1:
                source = DevicePrefetcher(
                    pack_segments(epoch_batches(epoch), seg), to_device
                )
            else:
                source = DevicePrefetcher(epoch_batches(epoch), to_device)
            for device_batch in source:
                if seg > 1:
                    n_steps = int(device_batch["user_idx"].shape[0])
                    rows = int(device_batch["user_idx"].shape[1])
                    state, metrics = self._segment_run(state, device_batch, rng)
                else:
                    n_steps, rows = 1, int(device_batch["user_idx"].shape[0])
                    state, metrics = self.train_step(state, device_batch, rng)
                timer.tick()
                prev_steps = steps
                steps += n_steps
                examples_seen += n_steps * rows
                # Fetch the *previous* dispatch's metrics — keeps dispatch
                # async. (Crossing test, not modulo: segments advance steps
                # by S at a time.) Skipped while an async checkpoint fetch
                # holds the transport: this readback is advisory, and on a
                # single-queue link it would stall the loop behind the bulk
                # state fetch (measured minutes mid-epoch). The epoch-end
                # record still fetches unconditionally.
                if pending is not None and (
                    prev_steps // cfg.log_every_steps
                    != steps // cfg.log_every_steps
                ) and not getattr(self.checkpoint_manager, "is_busy", False):
                    host = {k: float(v) for k, v in jax.device_get(pending).items()}
                    self._write({f"train/{k}": v for k, v in host.items()}, int(state.step))
                    warn_dropped_ids(host, epoch=epoch, step=int(state.step))
                    logger.info(
                        "epoch %d step %d loss %.4f acc %.4f",
                        epoch, int(state.step), host.get("loss", np.nan),
                        host.get("accuracy", np.nan),
                    )
                pending = metrics
            epoch_time = time.perf_counter() - t_epoch
            train_time += epoch_time
            eps = steps * cfg.batch_size / max(epoch_time, 1e-9)
            record: dict[str, float] = {"epoch": float(epoch), "examples_per_sec": eps}
            timing = timer.summary()
            if seg > 1:  # ticks are per-segment, not per-step: say so
                timing = {
                    k.replace("step_time", "segment_time"): v
                    for k, v in timing.items()
                }
            record.update(timing)
            if pending is not None:
                record.update({k: float(v) for k, v in jax.device_get(pending).items()})
                warn_dropped_ids(record, epoch=epoch, step=int(state.step))

            if self.evaluate_fn is not None and (epoch + 1) % cfg.validation_freq == 0:
                val = self.evaluate_fn(state.params)
                record.update({f"val/{k}": v for k, v in val.items()})
                metric = val.get(cfg.early_stopping_metric)
                if metric is None:
                    raise KeyError(
                        f"early_stopping_metric {cfg.early_stopping_metric!r} "
                        f"not in validation metrics {sorted(val)}"
                    )
                logger.info(
                    "epoch %d done in %.1fs (%.0f ex/s) %s=%.4f",
                    epoch, epoch_time, eps, cfg.early_stopping_metric, metric,
                )
                improved = metric > stopper.best
                should_stop = stopper.update(metric, int(state.step))
                if improved and self.checkpoint_manager is not None:
                    self.checkpoint_manager.save(
                        int(state.step),
                        state,
                        metrics={cfg.early_stopping_metric: metric},
                        extra={"epoch": epoch + 1},
                    )
                result.history.append(record)
                self._write(record, int(state.step))
                if should_stop:
                    logger.info(
                        "early stopping at epoch %d (best %s=%.4f @ step %d)",
                        epoch, cfg.early_stopping_metric, stopper.best, stopper.best_step,
                    )
                    break
            else:
                logger.info("epoch %d done in %.1fs (%.0f ex/s)", epoch, epoch_time, eps)
                result.history.append(record)
                self._write(record, int(state.step))

            if self.shutdown is not None and self.shutdown.should_stop:
                # Preemption: persist progress before exiting the loop.
                # flush() then force=True — a plain save() would be silently
                # busy/interval-skipped (async default + 900s accept window
                # in the lifecycle config means the skip is the COMMON case)
                # and the {epoch, preempted} resume metadata would be lost.
                if self.checkpoint_manager is not None:
                    self.checkpoint_manager.flush()
                    self.checkpoint_manager.save(
                        int(state.step), state,
                        extra={"epoch": epoch + 1, "preempted": True},
                        force=True,
                    )
                logger.warning("graceful shutdown after epoch %d", epoch)
                break

        if self.checkpoint_manager is not None:
            # Drain async saves (no-op when synchronous): the best state
            # must be durable before fit returns — counted in e2e wall
            # time, outside the train-phase time.
            self.checkpoint_manager.flush()
            ensure_final_persisted(
                self.checkpoint_manager, state, stopper,
                epoch=start_epoch + len(result.history),
            )
        total_time = time.perf_counter() - t_start
        result.state = state
        result.best_metric = stopper.best
        result.best_step = stopper.best_step
        result.finalize_throughput(examples_seen, train_time, total_time)
        return result

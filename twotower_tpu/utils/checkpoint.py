"""Sharded checkpoint/resume.

The reference has NO model checkpointing (SURVEY.md §5.4: only a parquet
cache and pickled id maps; `.gitignore:37` reserves ``models/artifacts/``).
This supplies the declared capability TPU-natively via Orbax: sharded,
async-capable save/restore of the full ``TrainState`` (params + optimizer
moments + step) together with a JSON metadata sidecar (config snapshot, data
cursor, metrics) and the vocab manifest — everything needed for exact resume
or for serving-side model load. No pickle anywhere (the reference had to
``# nosec`` its pickle usage, prepare_training_data.py:229).
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)


class CheckpointManager:
    """Keep the last ``keep`` checkpoints under ``directory/step_N/``.

    Orbax handles sharded arrays natively: on a mesh, each host writes only
    its addressable shards, and restore re-shards to the target topology.

    ``async_save=True`` (single-controller only — multi-process runs
    silently keep the synchronous collective save) moves the whole save off
    the training thread: ``save`` snapshots the state ON DEVICE (an
    HBM-to-HBM copy — milliseconds; the training step is then free to
    donate the live buffers) and enqueues it for a background worker that
    performs the device->host fetch and the Orbax write. On a
    high-latency device transport the fetch dominates the save (measured
    270 s for the 5.7 GB config-3 train state on the tunneled v5e — 4x the
    63 s epoch it interrupted); async saving overlaps it with subsequent
    epochs.

    HBM discipline: at most ONE snapshot exists at a time — ``save``
    requests arriving while the worker is busy, or within
    ``min_interval_s`` of the last accepted request, are SKIPPED (no
    snapshot allocated; logged). Unbounded snapshotting OOMed a 16 GB
    chip at config-3 scale: live state 5.7 GB + in-fetch snapshot +
    superseding pending snapshot = 17.1 GB. The worker also frees each
    snapshot leaf as soon as it is fetched, so in-fetch residency decays
    to zero. The trade: the best checkpoint on disk is at most one
    accepted-save interval older than the true best validation — save
    requests fire only on improving epochs, so late-training (rare)
    improvements almost always find the worker idle and are captured
    exactly; ``flush()`` at the end of ``fit`` drains the in-flight save
    before the process exits.
    """

    def __init__(
        self,
        directory: str | Path,
        *,
        keep: int = 3,
        async_save: bool = False,
        fetch_chunk_mb: int = 64,
        min_interval_s: float = 0.0,
    ):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()
        self.async_save = bool(async_save) and jax.process_count() == 1
        if async_save and not self.async_save:
            logger.info(
                "async_save requested but %d processes need the collective "
                "synchronous save; disabled", jax.process_count(),
            )
        # The background fetch streams each big array in row slices of this
        # many MB: a single-queue transport (the tunneled chip) would
        # otherwise block every foreground fetch (validation results,
        # metric readbacks) behind a monolithic multi-GB device_get —
        # measured as multi-minute mid-epoch stalls. Chunking bounds any
        # foreground wait to ~one chunk.
        self.fetch_chunk_bytes = int(fetch_chunk_mb) << 20
        # Minimum seconds between ACCEPTED save requests: with epochs far
        # cheaper than saves, accepting every improving epoch would keep
        # the transport 100% busy fetching state (and pile up snapshots in
        # HBM). Requests inside the window are skipped outright.
        self.min_interval_s = float(min_interval_s)
        self._lock = threading.Lock()
        self._pending: tuple | None = None  # newest not-yet-started request
        self._work = threading.Semaphore(0)
        self._idle = threading.Event()
        self._idle.set()
        self._worker: threading.Thread | None = None
        self._worker_err: BaseException | None = None
        # -inf, not 0.0: time.monotonic() is time-since-boot on Linux, so a
        # freshly booted host would otherwise treat the FIRST improving-epoch
        # save as inside the accept interval and skip it.
        self._last_accept = float("-inf")

    @property
    def is_busy(self) -> bool:
        """An async save is queued or being written (advisory: callers may
        defer optional foreground fetches to avoid transport contention)."""
        return not self._idle.is_set()

    def _fetch_chunked(self, tree: Any, *, free_leaves: bool = False) -> Any:
        """device_get a pytree, streaming big arrays in row slices so other
        threads' fetches can interleave between chunks. ``free_leaves``
        deletes each device buffer as soon as its host copy lands (snapshot
        trees only — nothing else may reference them), so HBM residency
        decays to zero over the fetch instead of holding the full tree."""
        import numpy as np

        chunk = self.fetch_chunk_bytes

        def fetch(x):
            size = getattr(x, "nbytes", 0)
            if size <= chunk or getattr(x, "ndim", 0) == 0:
                out = jax.device_get(x)
            else:
                row_bytes = max(1, size // x.shape[0])
                rows = max(1, chunk // row_bytes)
                parts = [
                    jax.device_get(x[i : i + rows])
                    for i in range(0, x.shape[0], rows)
                ]
                out = np.concatenate(parts, axis=0)
            if free_leaves and isinstance(x, jax.Array):
                x.delete()
            return out

        return jax.tree_util.tree_map(fetch, tree)

    # -- async machinery -----------------------------------------------------

    def _ensure_worker(self) -> None:
        if self._worker is not None and self._worker.is_alive():
            return

        import time as _time

        def loop() -> None:
            while True:
                self._work.acquire()
                with self._lock:
                    req = self._pending
                    self._pending = None
                    if req is None:  # coalesced away or shutdown sentinel
                        if self._pending is None:
                            self._idle.set()
                        continue
                    self._idle.clear()
                step, snapshot, metrics, extra = req
                del req
                try:
                    # free_leaves: each snapshot buffer is deleted the
                    # moment its host copy lands, so the extra HBM decays
                    # to zero across the fetch.
                    host_state = self._fetch_chunked(snapshot, free_leaves=True)
                    del snapshot
                    self._save_now(step, host_state, metrics=metrics, extra=extra)
                except BaseException as e:  # surface on the next save/flush
                    logger.exception("async checkpoint save failed at step %d", step)
                    self._worker_err = e
                finally:
                    with self._lock:
                        if self._pending is None:
                            self._idle.set()

        self._worker = threading.Thread(
            target=loop, name="ckpt-saver", daemon=True
        )
        self._worker.start()

    def flush(self, timeout: float | None = None) -> None:
        """Block until every pending async save has reached disk (no-op for
        synchronous managers). Raises if the worker failed, and raises
        ``TimeoutError`` if the pending save did not reach disk within
        ``timeout`` seconds — a timed flush that returned silently would give
        the caller neither durability nor an error."""
        if self._worker is not None:
            drained = self._idle.wait(timeout)
            if not drained:
                raise TimeoutError(
                    f"async checkpoint save still in flight after {timeout}s"
                )
        if self._worker_err is not None:
            err, self._worker_err = self._worker_err, None
            raise err

    # ------------------------------------------------------------------

    def _step_dir(self, step: int) -> Path:
        return self.directory / f"step_{step:010d}"

    def all_steps(self) -> list[int]:
        steps = []
        for p in self.directory.glob("step_*"):
            if not (p / "meta.json").exists():
                continue  # incomplete (crashed mid-save) — not restorable
            try:
                steps.append(int(p.name.split("_")[1]))
            except (IndexError, ValueError):
                continue
        return sorted(steps)

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def best_step(self, metric: str | None = None) -> int | None:
        """The durable step with the highest recorded validation metric
        (``metric`` names a key in the save-time ``metrics`` dict; None
        accepts any sole recorded metric). Steps without a metric (e.g.
        preemption saves) are skipped. A ``post_starvation_final``
        backstop competes at its ``best_val_at_stop`` PROXY — that value
        describes a lost (skipped-save) step, but the final state is
        within early-stopping patience of it, so when the proxy EXCEEDS
        every genuine durable metric the final state is the expected-best
        restore (round-5 incident: a 1736 s run under a 900 s accept
        interval left only the epoch-1 save and the backstop durable —
        preferring the genuine epoch-1 metric evaluated a 30x-worse
        model). Genuine metrics win ties. None when nothing qualifies,
        in which case callers fall back to latest."""
        best: tuple[float, int, bool] | None = None
        for step in self.all_steps():
            try:
                meta = json.loads((self._step_dir(step) / "meta.json").read_text())
            except (OSError, ValueError):
                continue
            metrics = meta.get("metrics") or {}
            proxy = bool(meta.get("post_starvation_final"))
            if proxy:
                value = metrics.get("best_val_at_stop")
            elif metric is not None:
                value = metrics.get(metric)
            elif len(metrics) == 1:
                value = next(iter(metrics.values()))
            else:
                value = None
            if value is None:
                continue
            v = float(value)
            if (
                best is None
                or v > best[0]
                # a genuine metric displaces an equal-valued proxy
                or (v == best[0] and best[2] and not proxy)
            ):
                best = (v, step, proxy)
        return best[1] if best else None

    # ------------------------------------------------------------------

    def save(
        self,
        step: int,
        state: Any,
        *,
        metrics: dict[str, float] | None = None,
        extra: dict[str, Any] | None = None,
        force: bool = False,
    ) -> Path:
        """Save state + metadata; prune beyond ``keep`` oldest-first.
        ``force`` bypasses the busy/interval skip (end-of-fit backstop;
        callers must flush() first so only one snapshot exists).

        Async managers return immediately after an on-device snapshot (see
        class docstring); call :meth:`flush` to guarantee durability."""
        path = self._step_dir(step)
        if not self.async_save:
            if self._worker_err is not None:
                self.flush()  # re-raise a prior async failure
            return self._save_now(step, state, metrics=metrics, extra=extra)
        if self._worker_err is not None:
            self.flush()
        self._ensure_worker()
        # HBM discipline (class docstring): at most one snapshot alive.
        # A request while the worker is busy, or inside the accept
        # interval, is skipped WITHOUT allocating — three state copies
        # (live + in-fetch + superseding) OOMed a 16 GB chip at config-3
        # scale. A later improving epoch (or flush-time durability of the
        # in-flight save) covers the skip.
        import time as _time

        now = _time.monotonic()
        if not force:
            if self.is_busy:
                logger.info(
                    "async checkpoint: skipping step %d (a save is in "
                    "flight; one snapshot max in HBM)", step,
                )
                return path
            if now - self._last_accept < self.min_interval_s:
                logger.info(
                    "async checkpoint: skipping step %d (%.0fs into the "
                    "%.0fs accept interval)", step, now - self._last_accept,
                    self.min_interval_s,
                )
                return path
        self._last_accept = now
        # Device-side snapshot: the training loop donates the live state
        # buffers on its next step, so the copy must exist BEFORE save
        # returns. HBM-to-HBM, so it costs milliseconds, not the transport.
        import jax.numpy as jnp

        snapshot = jax.tree_util.tree_map(jnp.copy, state)
        with self._lock:
            fresh = self._pending is None
            self._pending = (step, snapshot, metrics, extra)
            self._idle.clear()
            if fresh:
                self._work.release()
        return path

    def _save_now(
        self,
        step: int,
        state: Any,
        *,
        metrics: dict[str, float] | None = None,
        extra: dict[str, Any] | None = None,
    ) -> Path:
        path = self._step_dir(step)
        if (path / "meta.json").exists():
            logger.info("checkpoint step %d already exists, skipping", step)
            return path
        if path.exists():
            # leftover from a crashed save: clear and rewrite
            import shutil

            logger.warning("removing incomplete checkpoint at %s", path)
            shutil.rmtree(path, ignore_errors=True)
        self._ckptr.save(path / "state", state)
        self._ckptr.wait_until_finished()
        meta = {
            "step": step,
            "metrics": metrics or {},
            "format": "twotower_tpu.checkpoint.v1",
            **(extra or {}),
        }
        # meta.json is written LAST: its presence marks the save complete
        if jax.process_index() == 0:
            (path / "meta.json").write_text(json.dumps(meta, indent=2))
        self._prune()
        logger.info("saved checkpoint at step %d -> %s", step, path)
        return path

    def restore(self, state_template: Any, step: int | None = None) -> tuple[Any, dict]:
        """Restore into the template's structure/shardings.

        ``state_template`` supplies pytree structure, dtypes, and shardings
        (pass a freshly initialized, mesh-placed state for distributed
        restore). Returns (state, metadata dict).
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        path = self._step_dir(step)
        state = self._ckptr.restore(path / "state", state_template)
        meta_path = path / "meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        logger.info("restored checkpoint step %d from %s", step, path)
        return state, meta

    def _prune(self) -> None:
        if jax.process_index() != 0:
            return
        steps = self.all_steps()
        import shutil

        for step in steps[: -self.keep] if self.keep > 0 else []:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)
            logger.debug("pruned checkpoint step %d", step)

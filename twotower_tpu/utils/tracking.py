"""Experiment tracking: pluggable metric writers.

The reference declares MLflow + W&B tracking but wires none of it
(reference: pyproject.toml:33-34; activate_dev.sh:38-39 export
``MLFLOW_TRACKING_URI``/``WANDB_PROJECT``). Here tracking is a tiny writer
protocol — ``write(metrics, step)`` — with stdout/JSONL built-ins and
optional MLflow/W&B adapters that import lazily and no-op gracefully when
the backend is unavailable. Only process 0 should construct writers on a
multi-host run (host-0-only logging, SURVEY.md §2.2 row 27).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Protocol

from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)


class MetricWriter(Protocol):
    def write(self, metrics: dict[str, float], step: int) -> None: ...
    def close(self) -> None: ...


class StdoutWriter:
    """Human-readable one-liner per write."""

    def write(self, metrics: dict[str, float], step: int) -> None:
        parts = " ".join(f"{k}={v:.5g}" for k, v in sorted(metrics.items()))
        logger.info("[step %d] %s", step, parts)

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


class JsonlWriter:
    """Append-only JSONL file — the durable default artifact."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")

    def write(self, metrics: dict[str, float], step: int) -> None:
        record = {"step": step, "time": time.time(), **metrics}
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


class MLflowWriter:
    """Adapter for the reference's declared MLflow tracking; lazy import."""

    def __init__(self, run_name: str | None = None, tracking_uri: str | None = None):
        try:
            import mlflow
        except ImportError:
            logger.warning("mlflow not installed; MLflowWriter is a no-op")
            self._mlflow = None
            return
        self._mlflow = mlflow
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        mlflow.start_run(run_name=run_name)

    def write(self, metrics: dict[str, float], step: int) -> None:
        if self._mlflow is None:
            return
        clean = {k.replace("@", "_at_"): v for k, v in metrics.items()}
        self._mlflow.log_metrics(clean, step=step)

    def close(self) -> None:
        if self._mlflow is not None:
            self._mlflow.end_run()


class WandbWriter:
    """Adapter for the reference's declared W&B tracking; lazy import."""

    def __init__(self, project: str | None = None, config: dict | None = None):
        try:
            import wandb
        except ImportError:
            logger.warning("wandb not installed; WandbWriter is a no-op")
            self._run = None
            return
        self._run = wandb.init(project=project, config=config or {})

    def write(self, metrics: dict[str, float], step: int) -> None:
        if self._run is None:
            return
        self._run.log(metrics, step=step)

    def close(self) -> None:
        if self._run is not None:
            self._run.finish()


class TensorBoardWriter:
    """TensorBoard event files (lazy import; pairs with the jax.profiler
    traces ``--profile-dir`` writes, which TensorBoard's profile plugin
    reads from the same logdir tree). Event writing needs a summary-writer
    backend: ``torch`` (torch.utils.tensorboard) or ``tensorboardX`` (the
    ``tracking`` extra) — the ``tensorboard`` package alone only ships the
    viewer."""

    def __init__(self, logdir: str | Path = "logs/tensorboard"):
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError:
            try:
                from tensorboardX import SummaryWriter
            except ImportError:
                logger.warning(
                    "no TensorBoard summary-writer backend (install torch or "
                    "tensorboardX); TensorBoardWriter is a no-op"
                )
                self._writer = None
                return
        self._writer = SummaryWriter(log_dir=str(logdir))

    def write(self, metrics: dict[str, float], step: int) -> None:
        if self._writer is None:
            return
        for k, v in metrics.items():
            self._writer.add_scalar(k, float(v), global_step=step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


def build_writers(
    kinds: list[str],
    *,
    jsonl_path: str | Path = "logs/metrics.jsonl",
    run_name: str | None = None,
) -> list[Any]:
    """Writer factory from config/CLI strings:
    stdout | jsonl | tensorboard | mlflow | wandb."""
    out: list[Any] = []
    for kind in kinds:
        if kind == "stdout":
            out.append(StdoutWriter())
        elif kind == "jsonl":
            out.append(JsonlWriter(jsonl_path))
        elif kind == "tensorboard":
            out.append(TensorBoardWriter(Path(jsonl_path).parent / "tensorboard"))
        elif kind == "mlflow":
            out.append(MLflowWriter(run_name=run_name))
        elif kind == "wandb":
            out.append(WandbWriter(project=run_name))
        else:
            raise ValueError(f"unknown metric writer {kind!r}")
    return out

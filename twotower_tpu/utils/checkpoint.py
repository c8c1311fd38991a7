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
    """

    def __init__(self, directory: str | Path, *, keep: int = 3):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()

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

    # ------------------------------------------------------------------

    def save(
        self,
        step: int,
        state: Any,
        *,
        metrics: dict[str, float] | None = None,
        extra: dict[str, Any] | None = None,
    ) -> Path:
        """Save state + metadata; prune beyond ``keep`` oldest-first."""
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

"""Device mesh construction for the GSPMD training/serving path.

The reference has zero distributed code (SURVEY.md §2.2 row 22: the word
"Distributed" appears once, aspirationally, at reference README.md:17).
This module supplies the TPU-native design: a 2-axis logical mesh —

- ``data``: batch (data-parallel) axis for the dense towers; on a multi-host
  pod this axis should span DCN (hosts) x part of ICI.
- ``model``: row-sharding axis for the embedding tables and the eval corpus;
  kept inside one ICI domain so table exchange rides ICI, never DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from twotower_tpu.config import MeshConfig
from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)


def build_mesh(config: MeshConfig, devices: list | None = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``num_model`` divides the device count; ``num_data`` is inferred as the
    complement when set to -1. Device order follows ``jax.devices()`` —
    contiguous device blocks form each model group, which on TPU slices keeps
    a model group physically adjacent on ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    num_model = config.num_model
    if n % num_model != 0:
        raise ValueError(f"num_model={num_model} does not divide device count {n}")
    num_data = config.num_data if config.num_data > 0 else n // num_model
    if num_data * num_model != n:
        raise ValueError(
            f"mesh {num_data}x{num_model} != device count {n} "
            "(set mesh.num_data=-1 to infer)"
        )
    grid = np.array(devices).reshape(num_data, num_model)
    mesh = Mesh(grid, (config.data_axis, config.model_axis))
    logger.info(
        "mesh: %d devices as (%s=%d, %s=%d)",
        n, config.data_axis, num_data, config.model_axis, num_model,
    )
    return mesh


def initialize_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``) — the TPU-native
    replacement for the communication backend the reference never had
    (SURVEY.md §5.8). MUST run before any other JAX call (touching the
    backend first — even ``jax.devices()`` — makes distributed init fail);
    no-op when no coordinator is given (single-process runs)."""
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

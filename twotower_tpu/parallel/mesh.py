"""Device mesh construction for the GSPMD training/serving path.

The reference has zero distributed code (SURVEY.md §2.2 row 22: the word
"Distributed" appears once, aspirationally, at reference README.md:17).
This module supplies the TPU-native design: a 2-axis logical mesh —

- ``data``: batch (data-parallel) axis for the dense towers; on a multi-host
  pod this axis spans DCN (hosts) x part of ICI.
- ``model``: row-sharding axis for the embedding tables and the eval corpus;
  kept inside one ICI domain so table exchange rides ICI, never DCN.

The ICI contract is ENFORCED, not assumed: on a multi-process slice each
model group is built from one process's local devices only (a model group
that crossed hosts would route the embedding all-to-all — the traffic the
whole capacity design optimizes — over DCN), and ``build_mesh`` raises a
loud error when ``num_model`` cannot fit inside a host. Within a host (and
on single-process multi-chip slices) device placement delegates to
``jax.experimental.mesh_utils.create_device_mesh`` so the model axis follows
physical ICI coordinates rather than device-id order.
"""

from __future__ import annotations

import collections

import jax
import numpy as np
from jax.sharding import Mesh

from twotower_tpu.config import MeshConfig
from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)


def _ici_grid(devices: list, num_rows: int, num_model: int) -> np.ndarray:
    """Arrange ``devices`` (one ICI domain) as ``[num_rows, num_model]``.

    Delegates to ``mesh_utils.create_device_mesh`` — on real TPU devices it
    reads physical coordinates so the minor (model) axis is ICI-contiguous;
    on CPU/virtual devices it degrades to an id-ordered reshape. Fake device
    objects in tests (no coords/kind attributes) take the plain-reshape
    fallback.
    """
    if num_rows * num_model == 1:
        return np.array(devices).reshape(num_rows, num_model)
    try:
        from jax.experimental import mesh_utils

        return np.asarray(
            mesh_utils.create_device_mesh(
                (num_rows, num_model), devices=devices
            )
        )
    except Exception:  # fake/partial device lists: keep given order
        return np.array(devices).reshape(num_rows, num_model)


def mesh_device_grid(config: MeshConfig, devices: list) -> np.ndarray:
    """Topology-aware ``[num_data, num_model]`` device grid (see
    ``build_mesh``). Split out so placement policy is testable with fake
    multi-process device lists (``tests/test_mesh_topology.py``)."""
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

    by_proc: dict[int, list] = collections.defaultdict(list)
    for d in devices:
        by_proc[getattr(d, "process_index", 0)].append(d)

    if len(by_proc) == 1:
        grid = _ici_grid(devices, num_data, num_model)
    else:
        local_counts = {p: len(ds) for p, ds in by_proc.items()}
        bad = {p: c for p, c in local_counts.items() if c % num_model != 0}
        if bad:
            msg = (
                f"mesh.num_model={num_model} does not divide the per-process "
                f"device counts {dict(sorted(local_counts.items()))}: a model "
                "group would span hosts and the embedding-table all-to-all "
                "would ride DCN instead of ICI (mesh contract, "
                "parallel/mesh.py module docstring). Set num_model to a "
                f"divisor of {min(local_counts.values())} (the smallest "
                "per-host device count) or restructure the slice."
            )
            if not config.allow_dcn_model_axis:
                raise ValueError(msg)
            logger.warning(
                "%s Proceeding because mesh.allow_dcn_model_axis=true — "
                "model-axis collectives WILL cross hosts.", msg
            )
            return np.array(devices).reshape(num_data, num_model)
        # Per-process blocks of model groups, concatenated along data.
        grid = np.concatenate(
            [
                _ici_grid(ds, len(ds) // num_model, num_model)
                for _, ds in sorted(by_proc.items())
            ],
            axis=0,
        )
        # Self-check the contract the whole sparse path relies on: every
        # model group (grid row) must live inside one process.
        for row in grid:
            procs = {getattr(d, "process_index", 0) for d in row}
            if len(procs) != 1:  # pragma: no cover - construction guarantees
                raise AssertionError(
                    f"model group spans processes {sorted(procs)}"
                )
    return grid


def build_mesh(config: MeshConfig, devices: list | None = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``num_model`` divides the device count; ``num_data`` is inferred as the
    complement when set to -1. Topology-aware placement:

    - **Multi-process** (real pods — each host is one process): devices are
      grouped by ``process_index``; each model group is carved from ONE
      process's devices, so the table all-to-all stays on ICI. ``num_model``
      must divide every process's local device count — a ``num_model`` wider
      than a host is rejected loudly instead of silently spanning DCN.
    - **Single process**: ``mesh_utils.create_device_mesh`` lays the model
      axis along physical ICI coordinates (id-ordered reshape on virtual/
      CPU devices, where adjacency is moot).
    """
    devices = list(devices if devices is not None else jax.devices())
    grid = mesh_device_grid(config, devices)
    num_data, num_model = grid.shape
    n_procs = len({getattr(d, "process_index", 0) for d in devices})
    mesh = Mesh(grid, (config.data_axis, config.model_axis))
    logger.info(
        "mesh: %d devices over %d process(es) as (%s=%d, %s=%d); "
        "model groups intra-process",
        len(devices), n_procs, config.data_axis, num_data,
        config.model_axis, num_model,
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

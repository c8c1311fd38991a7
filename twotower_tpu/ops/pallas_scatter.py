"""Pallas fused sparse-Adam row-update kernel — the "gradient scatter".

XLA lowers each ``table.at[rows].add(...)`` to a serialized row-at-a-time
scatter (measured ~1.2 ms per 4096x128 scatter on v5e, ~100x off roofline),
and the sparse step needs six of them (table/mu/nu x user/item) plus the
matching moment gathers. This kernel replaces ALL of it for one table with a
single pass: for each targeted row it issues async DMAs for the table, mu,
and nu rows, computes the lazy-Adam update in VMEM, and writes the three
rows back — with a block of row-DMAs in flight at once, the HBM row-access
latency is overlapped instead of serialized.

In-place semantics via ``input_output_aliases`` (table/mu/nu buffers are
donated); invalid rows (duplicate ids aimed at the dead row by
``training.sparse.dedup_rows``) skip their write-back entirely, so there are
no read-modify-write races. Golden-tested against the XLA
``adam_row_update`` in interpret mode and on real TPU.

Measured (v5e, hard-sync slope, 4096 rows into 500k x 128): 2.5-2.7 ms vs
XLA's 2.3 ms — PARITY, not a win: both are bound by the count of 512-byte
row transfers (3 reads + 3 writes per row), which XLA's scatter pipeline
already overlaps. This kernel is therefore NOT dispatched by default; it is
the validated scaffold for the variant that would win — packing (table, mu,
nu) as one ``[N, 3E]`` row so each row costs one 1.5 KB read + one write
(3x fewer transfers), which requires a state-layout change and is future
work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK = 128  # rows per grid step = outstanding DMA reads per buffer


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    # scalar prefetch
    targets_smem,  # [B] int32 row ids (dead-row entries have valid=0)
    valid_smem,  # [B] int32 0/1
    # tensor inputs
    grads_ref,  # [BLOCK, E] VMEM block of summed row grads
    scalars_ref,  # [1, 4] SMEM: lr, bias1, bias2, eps
    table_ref,  # [N, E] ANY (aliased output 0)
    mu_ref,  # [N, E] ANY (aliased output 1)
    nu_ref,  # [N, E] ANY (aliased output 2)
    # outputs (aliased)
    out_table,
    out_mu,
    out_nu,
    # scratch
    t_buf,  # [BLOCK, E] VMEM
    m_buf,
    n_buf,
    sems,  # shared counting DMA sems (3,) — one per buffer kind
    wsems,  # shared write sems (3,)
    *,
    block: int,
    b1: float,
    b2: float,
):
    i = pl.program_id(0)
    base = i * block

    # Launch all row reads for this block (3 x BLOCK outstanding DMAs), all
    # signalling one shared counting semaphore per buffer kind; draining
    # BLOCK completions per kind then guarantees every read landed.
    for j in range(block):
        row = targets_smem[base + j]
        pltpu.make_async_copy(out_table.at[row], t_buf.at[j], sems.at[0]).start()
        pltpu.make_async_copy(out_mu.at[row], m_buf.at[j], sems.at[1]).start()
        pltpu.make_async_copy(out_nu.at[row], n_buf.at[j], sems.at[2]).start()
    # DMA semaphores count bytes: drain one row-copy's worth per wait.
    for j in range(block):
        row = targets_smem[base + j]
        pltpu.make_async_copy(out_table.at[row], t_buf.at[j], sems.at[0]).wait()
        pltpu.make_async_copy(out_mu.at[row], m_buf.at[j], sems.at[1]).wait()
        pltpu.make_async_copy(out_nu.at[row], n_buf.at[j], sems.at[2]).wait()

    lr = scalars_ref[0, 0]
    bias1 = scalars_ref[0, 1]
    bias2 = scalars_ref[0, 2]
    eps = scalars_ref[0, 3]

    g = grads_ref[:]
    new_mu = b1 * m_buf[:] + (1.0 - b1) * g
    new_nu = b2 * n_buf[:] + (1.0 - b2) * g * g
    update = lr * (new_mu / bias1) / (jnp.sqrt(new_nu / bias2) + eps)
    t_buf[:] = t_buf[:] - update
    m_buf[:] = new_mu
    n_buf[:] = new_nu

    # Write back only valid rows — dead-row duplicates never touch memory.
    for j in range(block):
        row = targets_smem[base + j]

        @pl.when(valid_smem[base + j] != 0)
        def _():
            pltpu.make_async_copy(t_buf.at[j], out_table.at[row], wsems.at[0]).start()
            pltpu.make_async_copy(m_buf.at[j], out_mu.at[row], wsems.at[1]).start()
            pltpu.make_async_copy(n_buf.at[j], out_nu.at[row], wsems.at[2]).start()

    for j in range(block):
        row = targets_smem[base + j]

        @pl.when(valid_smem[base + j] != 0)
        def _():
            pltpu.make_async_copy(t_buf.at[j], out_table.at[row], wsems.at[0]).wait()
            pltpu.make_async_copy(m_buf.at[j], out_mu.at[row], wsems.at[1]).wait()
            pltpu.make_async_copy(n_buf.at[j], out_nu.at[row], wsems.at[2]).wait()


def fused_adam_row_update(
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
    """Drop-in for ``training.sparse.adam_row_update`` (same contract);
    donates table/mu/nu and updates the targeted rows in place."""
    b = targets.shape[0]
    n, e = table.shape
    if b % _BLOCK != 0:
        raise ValueError(f"row count {b} must be a multiple of {_BLOCK}")
    t = step.astype(jnp.float32)
    scalars = jnp.stack(
        [
            jnp.asarray(lr, jnp.float32),
            1.0 - b1**t,
            1.0 - b2**t,
            jnp.asarray(eps, jnp.float32),
        ]
    ).reshape(1, 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, e), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((_BLOCK, e), jnp.float32),
            pltpu.VMEM((_BLOCK, e), jnp.float32),
            pltpu.VMEM((_BLOCK, e), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kernel = functools.partial(_kernel, block=_BLOCK, b1=b1, b2=b2)
    out_table, out_mu, out_nu = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, e), jnp.float32),
            jax.ShapeDtypeStruct((n, e), jnp.float32),
            jax.ShapeDtypeStruct((n, e), jnp.float32),
        ],
        # args: targets, valid (scalar prefetch) | grads, scalars, table, mu, nu
        input_output_aliases={4: 0, 5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(
        targets.astype(jnp.int32),
        valid.astype(jnp.int32),
        grads.astype(jnp.float32),
        scalars,
        table,
        mu,
        nu,
    )
    return out_table, out_mu, out_nu

"""Pallas TPU kernels for the retrieval hot path.

The BASELINE.json north star names two fused kernels: scoring+softmax for the
in-batch loss, and lookup/top-k for retrieval. This module implements the
fused in-batch sampled-softmax loss: forward computes the ``B x B`` score
matrix block-by-block in VMEM (never materializing it in HBM) fused with
temperature scaling, log-Q correction, accidental-hit masking, and a
numerically-stable log-sum-exp; backward recomputes scores per block and
accumulates both tower gradients via the sequential TPU grid.

Every kernel has an XLA reference twin in ``ops/losses.py`` and is
golden-tested against it (tests/test_pallas.py). Dispatch: ``fused_*``
functions fall back to the XLA path off-TPU or on shapes the kernel does not
cover (``ops/dispatch.py``).

Scope note — ops measured and deliberately LEFT to XLA (profile-first):
- embedding gather+pool (the text embedding-bag): XLA's gather+reduce fusion
  runs at 0.03 ms for 4096x32 tokens over a 65k x 128 table on v5e — memory-
  bound optimal; a PrefetchScalarGridSpec DMA kernel additionally cannot hold
  [B, T] token addresses in 1 MB SMEM at production batch sizes.
- serving top-k: ``lax.approx_max_k`` lowers to the TPU PartialReduce
  primitive (1.0 ms @ 500k items) — hardware support a Pallas kernel cannot
  beat; the exact eval path's chunked-scan merge is MXU matmul + top_k,
  which XLA already pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e9


def _interpret() -> bool:
    """Interpreter mode off-TPU so the same kernels run (and are golden-
    tested) on the CPU mesh used by the unit suite."""
    return jax.default_backend() != "tpu"

# Row-block size: 256 rows x B cols of f32 scores stay well under VMEM
# (256*8192*4 = 8 MB at the largest supported batch).
_BLOCK_ROWS = 256
_MAX_BATCH = 8192


# VMEM bound for the backward (the bigger kernel): the resident V + dV
# full-array blocks plus two [BLOCK_ROWS, B] f32 working tiles (scores and
# ds; Mosaic reuses the rest). Budget is the ~16 MB/core capacity — shapes
# beyond it (e.g. 8192 x 512) fall back to the XLA loss via the dispatcher.
_VMEM_BUDGET_BYTES = 16 * 1024 * 1024


def _supported(rows: int, cols: int, dim: int) -> bool:
    """Kernel coverage for a ``[rows, cols]`` score block (``rows == cols``
    on the single-device path; ``rows == cols / num_data`` on the sharded
    block path)."""
    vmem = 2 * cols * dim * 4 + 2 * _BLOCK_ROWS * cols * 4
    return (
        rows % _BLOCK_ROWS == 0
        and cols <= _MAX_BATCH
        and dim % 128 == 0
        and vmem <= _VMEM_BUDGET_BYTES
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    u_ref,  # [BR, D]      row block of user embeddings
    v_ref,  # [B, D]       all item embeddings (full-batch columns)
    idx_ref,  # [1, B]     int32 item ids (for accidental-hit masking)
    logq_ref,  # [1, B]    log q per column (zeros when disabled;
    #                      +1e9 folded in for zero-weight padding columns)
    off_ref,  # [1, 1]     SMEM: global row offset of this U block's rows
    loss_ref,  # [BR, 1]   out: per-row CE loss
    lse_ref,  # [BR, 1]    out: per-row logsumexp (saved for backward)
    correct_ref,  # [BR, 1] out: 1.0 where the positive is the row argmax
    pos_ref,  # [BR, 1]    out: the positive's (corrected) logit
    *,
    inv_temp: float,
    block_rows: int,
):
    i = pl.program_id(0)
    # Global row of this block's first row. The offset is a multiple of the
    # block size by contract (data-shard offsets are multiples of the local
    # row count, itself a multiple of _BLOCK_ROWS) — the hint lets Mosaic
    # prove the idx_ref dynamic slice below is lane-aligned.
    row0 = pl.multiple_of(off_ref[0, 0] + i * block_rows, block_rows)
    # Scores on the MXU, f32 accumulation: [BR, B].
    s = jax.lax.dot_general(
        u_ref[:],
        v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * inv_temp - logq_ref[0, :][None, :]

    batch = v_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, batch), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, batch), 0) + row0
    row_item = idx_ref[0, pl.ds(row0, block_rows)][:, None]
    same_item = idx_ref[0, :][None, :] == row_item
    diag = col_ids == row_ids
    s = jnp.where(same_item & (~diag), _NEG_INF, s)

    m = jnp.max(s, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True))
    pos = jnp.sum(jnp.where(diag, s, 0.0), axis=1, keepdims=True)
    loss_ref[:] = lse - pos
    lse_ref[:] = lse
    correct_ref[:] = (pos >= m).astype(jnp.float32)
    pos_ref[:] = pos


def _fwd_call(u, v, item_idx, log_q_cols, row_offset, *, temperature: float):
    rows, dim = u.shape
    batch = v.shape[0]
    grid = (rows // _BLOCK_ROWS,)
    kernel = functools.partial(
        _fwd_kernel, inv_temp=1.0 / temperature, block_rows=_BLOCK_ROWS
    )
    row_out = pl.BlockSpec((_BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    loss, lse, correct, pos = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[row_out, row_out, row_out, row_out],
        out_shape=[jax.ShapeDtypeStruct((rows, 1), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * batch * dim,
            bytes_accessed=(rows + batch) * dim * 4 + batch * 8,
            transcendentals=rows * batch,
        ),
        interpret=_interpret(),
    )(
        u,
        v,
        item_idx.reshape(1, batch),
        log_q_cols.reshape(1, batch),
        jnp.asarray(row_offset, jnp.int32).reshape(1, 1),
    )
    return loss[:, 0], lse[:, 0], correct[:, 0], pos[:, 0]


# ---------------------------------------------------------------------------
# Backward kernel: recompute scores per row block, emit dU block and
# accumulate dV (sequential grid => safe read-modify-write on the full-V
# output block).
# ---------------------------------------------------------------------------


def _bwd_kernel(
    u_ref,  # [BR, D]
    v_ref,  # [B, D]
    idx_ref,  # [1, B]
    logq_ref,  # [1, B]
    off_ref,  # [1, 1]   SMEM: global row offset
    lse_ref,  # [BR, 1]
    g_ref,  # [BR, 1]   upstream grad per row (includes weights/denom)
    du_ref,  # [BR, D]  out
    dv_ref,  # [B, D]   out (accumulated across grid steps)
    *,
    inv_temp: float,
    block_rows: int,
):
    i = pl.program_id(0)
    row0 = pl.multiple_of(off_ref[0, 0] + i * block_rows, block_rows)

    @pl.when(i == 0)
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)

    s = jax.lax.dot_general(
        u_ref[:],
        v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * inv_temp - logq_ref[0, :][None, :]

    batch = v_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, batch), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, batch), 0) + row0
    row_item = idx_ref[0, pl.ds(row0, block_rows)][:, None]
    same_item = idx_ref[0, :][None, :] == row_item
    diag = col_ids == row_ids
    masked = same_item & (~diag)

    p = jnp.exp(s - lse_ref[:])  # [BR, B] softmax row probs
    p = jnp.where(masked, 0.0, p)
    # dL/ds = (p - onehot(diag)); scale by upstream g and 1/temp.
    ds = (p - jnp.where(diag, 1.0, 0.0)) * g_ref[:] * inv_temp

    du_ref[:] = jax.lax.dot_general(
        ds,
        v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[:] += jax.lax.dot_general(
        ds,
        u_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_call(u, v, item_idx, log_q_cols, row_offset, lse, g_rows, *, temperature: float):
    rows, dim = u.shape
    batch = v.shape[0]
    grid = (rows // _BLOCK_ROWS,)
    kernel = functools.partial(
        _bwd_kernel, inv_temp=1.0 / temperature, block_rows=_BLOCK_ROWS
    )
    du, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_ROWS, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * rows * batch * dim,
            bytes_accessed=(rows + batch) * dim * 4 * 2,
            transcendentals=rows * batch,
        ),
        interpret=_interpret(),
    )(
        u,
        v,
        item_idx.reshape(1, batch),
        log_q_cols.reshape(1, batch),
        jnp.asarray(row_offset, jnp.int32).reshape(1, 1),
        lse.reshape(rows, 1),
        g_rows.reshape(rows, 1),
    )
    return du, dv


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_per_example_loss(u, v, item_idx, log_q_cols, row_offset, temperature):
    loss, _, correct, pos = _fwd_call(
        u, v, item_idx, log_q_cols, row_offset, temperature=temperature
    )
    return loss, correct, pos


def _fused_fwd(u, v, item_idx, log_q_cols, row_offset, temperature):
    loss, lse, correct, pos = _fwd_call(
        u, v, item_idx, log_q_cols, row_offset, temperature=temperature
    )
    return (loss, correct, pos), (u, v, item_idx, log_q_cols, row_offset, lse)


def _fused_bwd(temperature, residuals, gs):
    u, v, item_idx, log_q_cols, row_offset, lse = residuals
    g, _, _ = gs  # correct/pos are metric outputs; their cotangents are zero
    du, dv = _bwd_call(
        u, v, item_idx, log_q_cols, row_offset, lse, g.astype(jnp.float32),
        temperature=temperature,
    )
    return du.astype(u.dtype), dv.astype(v.dtype), None, None, None


_fused_per_example_loss.defvjp(_fused_fwd, _fused_bwd)


def _logq_cols(
    item_idx: Array, log_q: Array | None, weights_all: Array | None, batch: int
) -> Array:
    """Per-column log-Q vector with zero-weight padding columns folded in as
    a +1e9 shift (so they mask to ~-1e9 after subtraction — padding columns
    must not act as in-batch negatives)."""
    cols = (
        log_q[item_idx].astype(jnp.float32)
        if log_q is not None
        else jnp.zeros((batch,), jnp.float32)
    )
    if weights_all is not None:
        cols = cols + jnp.where(weights_all == 0.0, -_NEG_INF, 0.0)
    return cols


def fused_in_batch_softmax_block(
    user_emb: Array,
    item_emb_all: Array,
    item_idx_all: Array,
    row_offset: Array | int,
    *,
    temperature: float = 0.1,
    log_q: Array | None = None,
    weights_all: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Pallas-fused twin of ``ops.losses.in_batch_softmax_block``: per-row
    ``(per_example, correct, raw_diag)`` for local user rows at
    ``row_offset`` against the full-batch item columns. This is the form the
    sharded train steps call per data shard (each shard's ``[B/D, B]``
    block); check shapes with ``supported_block`` first.
    """
    rows, dim = user_emb.shape
    batch = item_emb_all.shape[0]
    if not _supported(rows, batch, dim):
        raise ValueError(
            f"fused loss kernel does not support rows={rows}, cols={batch}, dim={dim}"
        )
    u = user_emb.astype(jnp.float32)
    v = item_emb_all.astype(jnp.float32)
    cols = _logq_cols(item_idx_all, log_q, weights_all, batch)
    per_example, correct, pos = _fused_per_example_loss(
        u, v, item_idx_all, cols, jnp.asarray(row_offset, jnp.int32), temperature
    )
    # Raw diagonal score from the kernel's corrected positive logit:
    # pos = raw/temp - logq_col  =>  raw = (pos + logq_col) * temp (exact,
    # including the folded padding shift).
    off = jnp.asarray(row_offset, jnp.int32)
    diag_cols = jax.lax.dynamic_slice_in_dim(cols, off, rows)
    raw_diag = (pos + diag_cols) * temperature
    return (
        per_example,
        jax.lax.stop_gradient(correct),
        jax.lax.stop_gradient(raw_diag),
    )


def fused_in_batch_softmax_loss(
    user_emb: Array,
    item_emb: Array,
    item_idx: Array,
    *,
    temperature: float = 0.1,
    log_q: Array | None = None,
    weights: Array | None = None,
) -> tuple[Array, dict[str, Array]]:
    """Pallas-fused drop-in for ``ops.losses.in_batch_softmax_loss``.

    Same contract and metrics; requires ``batch % 256 == 0``, ``batch <=
    8192``, ``dim % 128 == 0`` (checked by ``supported_for``; use the
    dispatcher in ``ops/dispatch.py`` rather than calling this directly).
    """
    batch, dim = user_emb.shape
    if not _supported(batch, batch, dim):
        raise ValueError(
            f"fused loss kernel does not support batch={batch}, dim={dim}"
        )
    per_example, correct, raw_diag = fused_in_batch_softmax_block(
        user_emb,
        item_emb,
        item_idx,
        0,
        temperature=temperature,
        log_q=log_q,
        weights_all=weights,
    )
    if weights is None:
        weights = jnp.ones((batch,), jnp.float32)
    weights = weights.astype(jnp.float32)
    denom = jnp.maximum(weights.sum(), 1.0)
    loss = (per_example * weights).sum() / denom
    metrics = {
        "accuracy": (correct * weights).sum() / denom,
        "logits_mean": (raw_diag * weights).sum() / denom,
    }
    return loss, metrics


def supported_for(batch: int, dim: int) -> bool:
    """Whether the fused loss kernel covers a square single-device batch."""
    return _supported(batch, batch, dim)


def supported_block(rows: int, cols: int, dim: int) -> bool:
    """Whether the fused block kernel covers a ``[rows, cols]`` score block."""
    return _supported(rows, cols, dim)

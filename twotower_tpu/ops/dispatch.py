"""Kernel dispatch: Pallas on TPU where shapes allow, XLA otherwise.

Keeps callers (training loop, evaluator, serving) backend-agnostic: they call
``in_batch_softmax_loss_auto`` and get the fused Pallas kernel on TPU for
covered shapes, or the XLA reference implementation elsewhere — bit-compatible
within float tolerance (golden-tested in tests/test_pallas.py).

Env override ``TWOTOWER_DISABLE_PALLAS=1`` forces the XLA path (useful for
benchmarking the delta and as an escape hatch).
"""

from __future__ import annotations

import os

import jax

from twotower_tpu.ops import losses, pallas_kernels

Array = jax.Array


def pallas_enabled() -> bool:
    return os.environ.get("TWOTOWER_DISABLE_PALLAS", "0") != "1"


def in_batch_softmax_loss_auto(
    user_emb: Array,
    item_emb: Array,
    item_idx: Array,
    *,
    temperature: float = 0.1,
    log_q: Array | None = None,
    weights: Array | None = None,
) -> tuple[Array, dict[str, Array]]:
    batch, dim = user_emb.shape
    if (
        pallas_enabled()
        and jax.default_backend() == "tpu"
        and pallas_kernels.supported_for(batch, dim)
    ):
        return pallas_kernels.fused_in_batch_softmax_loss(
            user_emb,
            item_emb,
            item_idx,
            temperature=temperature,
            log_q=log_q,
            weights=weights,
        )
    return losses.in_batch_softmax_loss(
        user_emb,
        item_emb,
        item_idx,
        temperature=temperature,
        log_q=log_q,
        weights=weights,
    )

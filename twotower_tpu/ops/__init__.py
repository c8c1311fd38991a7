"""Compute ops: retrieval losses and on-device top-k MIPS.

XLA reference implementations live here; Pallas TPU kernels for the same ops
live in ``ops.pallas_kernels`` and are golden-tested against these.
"""

from twotower_tpu.ops.losses import (
    in_batch_softmax_loss,
    l2_penalty,
    mixed_sampled_softmax_loss,
    uniform_sampled_softmax_loss,
)
from twotower_tpu.ops.topk import (
    topk_mips,
    topk_mips_approx,
    topk_mips_approx_sharded,
    topk_mips_sharded,
)

__all__ = [
    "in_batch_softmax_loss",
    "l2_penalty",
    "mixed_sampled_softmax_loss",
    "uniform_sampled_softmax_loss",
    "topk_mips",
    "topk_mips_approx",
    "topk_mips_approx_sharded",
    "topk_mips_sharded",
]

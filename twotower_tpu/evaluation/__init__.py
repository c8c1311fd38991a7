"""Evaluation layer: retrieval metrics + full-corpus evaluator."""

from twotower_tpu.evaluation.evaluator import Evaluator
from twotower_tpu.evaluation.metrics import metrics_at_k, rank_of_true_item

__all__ = ["Evaluator", "metrics_at_k", "rank_of_true_item"]

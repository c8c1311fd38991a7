"""Serving layer: retrieval index (TPU MIPS + native CPU fallback) + HTTP API."""

from twotower_tpu.serving.cpu_index import CpuFlatIndex
from twotower_tpu.serving.index import RetrievalIndex

__all__ = ["CpuFlatIndex", "RetrievalIndex"]

"""ctypes binding for the native C++ flat MIPS index.

Builds ``native/flat_index.cpp`` into a shared library on first use (cached
next to the source; rebuilt when the source changes) and exposes a
FAISS-flat-like interface. Falls back to a NumPy implementation when no C++
toolchain is available — same exact results, slower.

Reference parity: this is the framework's native-code replacement for the
``faiss-cpu``/``annoy`` wheels the reference declared but never imported
(reference: pyproject.toml:38-39; SURVEY.md §2.2 row 25).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)

_SRC = Path(__file__).resolve().parent.parent / "native" / "flat_index.cpp"
_LIB_CACHE: dict[str, ctypes.CDLL] = {}


def _build_library() -> ctypes.CDLL | None:
    """Compile (once) and load the shared library; None if unavailable."""
    src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("TWOTOWER_NATIVE_CACHE", Path(tempfile.gettempdir()) / "twotower_native")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / f"flat_index_{src_hash}.so"

    if str(lib_path) in _LIB_CACHE:
        return _LIB_CACHE[str(lib_path)]

    if not lib_path.exists():
        cmd = [
            "g++", "-O3", "-march=native", "-ffast-math", "-fopenmp",
            "-shared", "-fPIC", str(_SRC), "-o", str(lib_path),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            logger.info("built native flat index -> %s", lib_path)
        except (OSError, subprocess.SubprocessError) as e:
            logger.warning("native index build failed (%s); using NumPy fallback", e)
            return None

    lib = ctypes.CDLL(str(lib_path))
    lib.flat_topk.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.flat_topk.restype = None
    lib.flat_index_num_threads.restype = ctypes.c_int32
    _LIB_CACHE[str(lib_path)] = lib
    return lib


class CpuFlatIndex:
    """Exact CPU MIPS index over a fixed corpus ``[n, d]`` float32."""

    def __init__(self, corpus: np.ndarray, *, force_numpy: bool = False):
        self.corpus = np.ascontiguousarray(corpus, np.float32)
        if self.corpus.ndim != 2:
            raise ValueError("corpus must be [n, d]")
        self._lib = None if force_numpy else _build_library()
        if self._lib is not None:
            logger.info(
                "CpuFlatIndex: native backend, %d threads, %d items",
                self._lib.flat_index_num_threads(), len(self.corpus),
            )
        else:
            logger.info("CpuFlatIndex: NumPy backend, %d items", len(self.corpus))

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "numpy"

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k: returns (scores [b, k] desc, indices [b, k])."""
        queries = np.ascontiguousarray(np.atleast_2d(queries), np.float32)
        n, d = self.corpus.shape
        b, dq = queries.shape
        if dq != d:
            raise ValueError(f"query dim {dq} != corpus dim {d}")
        if not 1 <= k <= n:
            raise ValueError(f"k={k} must be in [1, {n}]")
        if self._lib is not None:
            scores = np.empty((b, k), np.float32)
            idx = np.empty((b, k), np.int32)
            self._lib.flat_topk(
                self.corpus.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n, d,
                queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                b, k,
                scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return scores, idx
        all_scores = queries @ self.corpus.T
        part = np.argpartition(-all_scores, k - 1, axis=1)[:, :k]
        part_scores = np.take_along_axis(all_scores, part, axis=1)
        order = np.argsort(-part_scores, axis=1, kind="stable")
        idx = np.take_along_axis(part, order, axis=1).astype(np.int32)
        scores = np.take_along_axis(part_scores, order, axis=1).astype(np.float32)
        return scores, idx

    @classmethod
    def from_npz(cls, path: str | Path, **kw) -> "CpuFlatIndex":
        with np.load(path) as data:
            return cls(data["corpus"], **kw)

"""Fixed-shape device batch pipeline.

The reference never feeds a model (its training module is a placeholder);
this is the TPU-native input pipeline the declared training loop needs
(SURVEY.md §2.2 rows 21-22): seeded per-epoch shuffling, drop-remainder
fixed-shape batches (static shapes — jit traces once), and an async
host->device prefetch queue so input never blocks the TPU step.

Batches are plain dicts of arrays: ``user_idx``, ``item_idx`` (int32) and
``weight`` (float32; 0 marks padding when ``drop_remainder=False``).
"""

from __future__ import annotations

import collections
import threading
from typing import Any, Iterator

import numpy as np

from twotower_tpu.data.schema import Interactions

Batch = dict[str, Any]


class BatchPipeline:
    """Seeded, epoch-aware batch iterator over encoded interactions."""

    def __init__(
        self,
        data: Interactions,
        batch_size: int,
        shuffle: bool = True,
        drop_remainder: bool = True,
        seed: int = 42,
    ):
        if data.user_idx is None or data.item_idx is None:
            raise ValueError("data must be encoded (run Preprocessor.process first)")
        self.user_idx = np.ascontiguousarray(data.user_idx, dtype=np.int32)
        self.item_idx = np.ascontiguousarray(data.item_idx, dtype=np.int32)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.seed = seed

    def __len__(self) -> int:
        n = len(self.user_idx)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    @property
    def num_examples(self) -> int:
        return len(self.user_idx)

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        """One pass over the data; shuffling is deterministic per (seed, epoch)."""
        n = len(self.user_idx)
        order = (
            np.random.default_rng(self.seed + epoch).permutation(n)
            if self.shuffle
            else np.arange(n)
        )
        bs = self.batch_size
        limit = (n // bs) * bs if self.drop_remainder else n
        for start in range(0, limit, bs):
            sel = order[start : start + bs]
            pad = bs - len(sel)
            weight = np.ones(bs, dtype=np.float32)
            if pad:
                # Static shape: pad with repeats of row 0, zero-weighted.
                sel = np.concatenate([sel, np.zeros(pad, dtype=sel.dtype)])
                weight[bs - pad :] = 0.0
            yield {
                "user_idx": self.user_idx[sel],
                "item_idx": self.item_idx[sel],
                "weight": weight,
            }

    def __iter__(self) -> Iterator[Batch]:
        return self.epoch(0)


class DevicePrefetcher:
    """Background-thread host->device prefetch (depth-bounded).

    Keeps the next ``depth`` batches already transferred (or sharded via the
    provided ``put`` callable, e.g. ``partial(jax.device_put, device=...)`` or
    a sharding-aware closure) while the TPU executes the current step.
    """

    _END = object()

    def __init__(self, batches: Iterator[Batch], put: Any, depth: int = 2):
        self._queue: collections.deque = collections.deque()
        self._sem = threading.Semaphore(0)
        self._space = threading.Semaphore(depth)
        self._err: BaseException | None = None

        def worker() -> None:
            try:
                for b in batches:
                    self._space.acquire()
                    self._queue.append(put(b))
                    self._sem.release()
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self._queue.append(self._END)
                self._sem.release()

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> "DevicePrefetcher":
        return self

    def __next__(self) -> Batch:
        self._sem.acquire()
        item = self._queue.popleft()
        if item is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        self._space.release()
        return item

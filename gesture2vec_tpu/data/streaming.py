"""Streaming dataset path for bigger-than-RAM corpora.

data/datasets.py materializes whole epochs as contiguous arrays - the
right call at the reference's corpus scale (the reference itself loads
the entire corpus into RAM up front, ref: lmdb_data_loader.py:367-390
create_all_poses), but a production corpus can exceed host RAM. This
module streams instead: clips are read shard-by-shard from the
ClipStore (its LRU keeps only a few clips resident), windows flow
through a bounded shuffle buffer, and fixed-shape batches emerge ready
for utils/prefetch double-buffering. RAM is bounded by
O(shuffle_buffer + 2 batches) regardless of corpus size.

Shuffling is two-level, the standard out-of-core recipe: clip order is
permuted per epoch, and windows mix inside a bounded reservoir. Both
draw from a per-epoch seeded RNG, so an epoch's batch stream is
deterministic and resume-friendly.

StreamSource ducks into the training loops: anything with
``.batches(epoch, batch_size)`` and ``__len__`` can replace the train
array in train_seq_ae / train_dae (the loops detect it), so the same
trainer covers in-RAM and streaming corpora.
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np

from gesture2vec_tpu.data.datasets import normalize
from gesture2vec_tpu.data.store import ClipStore


def _shuffled_stream(items: Iterator[np.ndarray], buffer_rows: int,
                     rng: np.random.Generator) -> Iterator[np.ndarray]:
    """Reservoir shuffle over row-blocks: maintain up to buffer_rows
    rows; each yield swaps a random resident row out.

    Rows are COPIED into the reservoir: a buffered row is a view into
    its parent block, and one surviving view pins the whole clip array
    — without the copy, steady-state RAM is ~buffer*ln(rows_per_clip)
    full clips, not the documented O(shuffle_buffer) bound."""
    buf: list = []
    for block in items:
        for row in block:
            if len(buf) < buffer_rows:
                buf.append(row.copy())
                continue
            j = int(rng.integers(len(buf)))
            out, buf[j] = buf[j], row.copy()
            yield out
    rng.shuffle(buf)
    yield from buf


class StreamingWindows:
    """Streaming (n_poses, D)-window source over a ClipStore.

    Parameters mirror data/datasets.pose_windows; transform (optional)
    maps a (B, n_poses, D) batch to the model's input (e.g. a jitted
    frozen-DAE teacher encode for Part b) inside the prefetch worker
    thread, so teacher compute overlaps the training step.
    """

    def __init__(self, store: ClipStore, n_poses: int, stride: int,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None,
                 shuffle_rows: int = 4096, seed: int = 0,
                 transform: Optional[Callable] = None):
        self.store = store
        self.n_poses = n_poses
        self.stride = stride
        self.mean = store.pose_mean if mean is None else mean
        self.std = store.pose_std if std is None else std
        self.shuffle_rows = shuffle_rows
        self.seed = seed
        self.transform = transform
        # one cheap metadata pass: window count per clip (no array data)
        self._per_clip = [
            max((c["n_frames"] - n_poses) // stride + 1, 0)
            for c in store.clips]
        self._n = sum(self._per_clip)

    def __len__(self) -> int:
        return self._n

    def _clip_windows(self, i: int) -> np.ndarray:
        from gesture2vec_tpu.utils.native import extract_windows
        poses = self.store.arrays(i)["poses"].astype(np.float32)
        w = extract_windows(poses, self.n_poses, self.stride)
        if self.mean is not None and self.std is not None:
            w = normalize(w, self.mean, self.std)
        return w.astype(np.float32)

    def batches(self, epoch: int, batch_size: int
                ) -> Iterator[np.ndarray]:
        """Deterministic per-epoch stream of (batch_size, n_poses, D)
        batches (trailing partial batch dropped, matching the
        array-path loops)."""
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.store.clips))
        blocks = (self._clip_windows(int(i)) for i in order
                  if self._per_clip[int(i)])
        rows = _shuffled_stream(blocks, self.shuffle_rows, rng)
        buf = []
        for row in rows:
            buf.append(row)
            if len(buf) == batch_size:
                batch = np.stack(buf, axis=0)
                buf.clear()
                yield (self.transform(batch) if self.transform
                       else batch)


class StreamingFrames:
    """Streaming (D,)-frame source (the Part-a dataset) over a
    ClipStore: all_frames without the whole-corpus concatenate."""

    def __init__(self, store: ClipStore,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None,
                 shuffle_rows: int = 65536, seed: int = 0):
        self.store = store
        self.mean = store.pose_mean if mean is None else mean
        self.std = store.pose_std if std is None else std
        self.shuffle_rows = shuffle_rows
        self.seed = seed
        self._n = sum(c["n_frames"] for c in store.clips)

    def __len__(self) -> int:
        return self._n

    def batches(self, epoch: int, batch_size: int
                ) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.store.clips))

        def blocks():
            for i in order:
                poses = self.store.arrays(int(i))["poses"] \
                    .astype(np.float32)
                if self.mean is not None and self.std is not None:
                    poses = normalize(poses, self.mean, self.std)
                yield poses.astype(np.float32)

        rows = _shuffled_stream(blocks(), self.shuffle_rows, rng)
        buf = []
        for row in rows:
            buf.append(row)
            if len(buf) == batch_size:
                batch = np.stack(buf, axis=0)
                buf.clear()
                yield batch

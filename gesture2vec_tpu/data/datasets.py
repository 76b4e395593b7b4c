"""Dataset views over a ClipStore + batching.

Rebuilds the reference's dataset classes
(ref: scripts/data_loader/lmdb_data_loader.py) as array-producing
functions: TPU training wants whole epochs as contiguous numpy arrays
with static batch shapes, not per-item __getitem__ workers. The
reference's design of running frozen teacher models inside __getitem__
(ref: lmdb_data_loader.py:649-662,1158-1187) moves to an explicit
offline encoding pass (see data/teacher.py) - same artifacts, computed
once per corpus instead of once per epoch per item.
"""
from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

from gesture2vec_tpu.data.store import ClipStore

STD_CLIP = 0.01  # ref: lmdb_data_loader.py:249-250 clips std at 0.01


def normalize(poses: np.ndarray, mean: np.ndarray,
              std: np.ndarray) -> np.ndarray:
    std = np.clip(std, a_min=STD_CLIP, a_max=None)
    return (poses - mean) / std


def unnormalize(poses: np.ndarray, mean: np.ndarray,
                std: np.ndarray) -> np.ndarray:
    std = np.clip(std, a_min=STD_CLIP, a_max=None)
    return poses * std + mean


def all_frames(store: ClipStore, mean: Optional[np.ndarray] = None,
               std: Optional[np.ndarray] = None) -> np.ndarray:
    """Every pose frame in the corpus as one (N, D) array - the Part-a
    dataset (ref: lmdb_data_loader.py:367-390 create_all_poses)."""
    mean = store.pose_mean if mean is None else mean
    std = store.pose_std if std is None else std
    frames = np.concatenate([c["poses"] for c in store], axis=0)
    if mean is not None and std is not None:
        frames = normalize(frames, mean, std)
    return frames.astype(np.float32)


def pose_windows(store: ClipStore, n_poses: int, stride: int,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None) -> np.ndarray:
    """(N, n_poses, D) sliding windows over every clip - the Part-b
    sample layout (ref: data_preprocessor.py:159-247 windows clips at
    subdivision_stride)."""
    from gesture2vec_tpu.utils.native import extract_windows

    mean = store.pose_mean if mean is None else mean
    std = store.pose_std if std is None else std
    wins: List[np.ndarray] = []
    for clip in store:
        w = extract_windows(clip["poses"], n_poses, stride)
        if w.shape[0]:
            wins.append(w)
    out = np.concatenate(wins, axis=0).astype(np.float32)
    if mean is not None and std is not None:
        out = normalize(out, mean, std)
    return out


def sentence_windows(store: ClipStore, frame_length: int, stride: int,
                     fps: int, min_words: int = 4,
                     context_s: float = 0.0
                     ) -> List[dict]:
    """Sentence-level windows with word lists - the Part-d sample layout
    (ref: data_preprocessor.py:155-247: windows of sentence_frame_length,
    skipped when fewer than 4 words fall inside,
    ref: data_preprocessor.py:247).

    context_s > 0 (beyond reference, config `text_context_s`) extends
    each window's WORD range backwards by that many seconds: motion at
    a window's start can depend on a word spoken just before it (motif
    crossfades straddle window boundaries), which the reference's
    window-local lookup cannot see. The min_words filter still applies
    to the window's own time range, so the window population is
    identical to context_s=0."""
    out = []
    for ci, clip in enumerate(store.clips):
        n_frames = clip["n_frames"]
        words = clip["words"]
        n = (n_frames - frame_length) // stride + 1
        for k in range(max(n, 0)):
            f0 = k * stride
            t0, t1 = f0 / fps, (f0 + frame_length) / fps
            # overlap rule, not midpoint: a word belongs to every
            # window it overlaps (ref: data_preprocessor.py:335-363
            # get_words_in_time_range, word_e > start and word_s < end)
            inside = [w for w in words if w[2] > t0 and w[1] < t1]
            if len(inside) < min_words:
                continue
            if context_s > 0:
                inside = [w for w in words
                          if w[2] > t0 - context_s and w[1] < t1]
            out.append({"clip": ci, "frame0": f0, "words": inside,
                        "t0": t0, "t1": t1})
    return out


def batch_iterator(arrays: Tuple[np.ndarray, ...], batch_size: int,
                   seed: int = 0, shuffle: bool = True,
                   drop_last: bool = True) -> Iterator[Tuple[np.ndarray, ...]]:
    """Shuffled fixed-shape minibatches over parallel arrays. drop_last
    keeps shapes static so every step hits the same XLA executable."""
    n = arrays[0].shape[0]
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    stop = n - (n % batch_size) if drop_last else n
    for s in range(0, stop, batch_size):
        take = idx[s:s + batch_size]
        yield tuple(a[take] for a in arrays)

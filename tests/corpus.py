"""Synthetic Trinity-layout corpus on disk for end-to-end tests."""
from __future__ import annotations

import json
import os

import numpy as np
from scipy.io import wavfile

from tests.fixtures import make_synthetic_bvh

_WORDS = ("hello world this is a test of gesture generation from speech "
          "transcripts with many different words being spoken now").split()


def make_corpus(root: str, n_files: int = 3, n_frames: int = 360,
                fps: int = 60, with_audio: bool = True) -> str:
    """Write Motion/*.bvh, Transcripts/*.json, Audio/*.wav under root."""
    os.makedirs(os.path.join(root, "Motion"), exist_ok=True)
    os.makedirs(os.path.join(root, "Transcripts"), exist_ok=True)
    os.makedirs(os.path.join(root, "Audio"), exist_ok=True)
    rng = np.random.default_rng(42)
    dur = n_frames / fps
    for i in range(n_files):
        name = f"Recording_{i:03d}"
        with open(os.path.join(root, "Motion", name + ".bvh"), "w") as f:
            f.write(make_synthetic_bvh(n_frames=n_frames, fps=fps, seed=i))
        # words spread evenly across the clip
        n_words = 18
        starts = np.linspace(0.1, dur - 0.4, n_words)
        words = [{"word": _WORDS[rng.integers(len(_WORDS))],
                  "start_time": f"{s:.2f}s",
                  "end_time": f"{s + 0.25:.2f}s"} for s in starts]
        with open(os.path.join(root, "Transcripts", name + ".json"),
                  "w") as f:
            json.dump(words, f)
        if with_audio:
            t = np.arange(int(16000 * dur)) / 16000
            wave = (0.1 * np.sin(2 * np.pi * 220 * t)
                    + 0.05 * rng.normal(size=t.shape)).astype(np.float32)
            wavfile.write(os.path.join(root, "Audio", name + ".wav"),
                          16000, wave)
    return root

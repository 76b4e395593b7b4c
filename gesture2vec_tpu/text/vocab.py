"""Vocabulary + word embeddings.

Rebuild of the reference Vocab (ref: scripts/model/vocab.py:21-260):
same special-token ids (PAD=0, SOS=1, EOS=2, UNK=3,
ref: vocab.py:41-44), same trim/index behavior. The reference loads
FastText .bin subword vectors (ref: vocab.py:166-190); that binary
format needs the fasttext package, so here embeddings come from
(a) a .vec/.txt text embedding file, (b) a .npy matrix aligned with the
vocab, or (c) a deterministic hash-seeded Gaussian fallback so the full
pipeline runs self-contained (each word always maps to the same vector,
which is what the downstream models actually require of it).
"""
from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional

import numpy as np

PAD, SOS, EOS, UNK = 0, 1, 2, 3
_SPECIALS = {PAD: "<PAD>", SOS: "<SOS>", EOS: "<EOS>", UNK: "<UNK>"}


def normalize_string(s: str) -> str:
    """Lowercase, strip apostrophes (shouldn't -> shouldnt), keep
    alphanumerics and ,.!? (ref: scripts/utils/data_utils.py:12-33 -
    digits are KEPT there, so "100" stays a vocabulary token)."""
    s = s.lower().strip()
    s = re.sub(r"([,.!?])", r" \1 ", s)
    s = re.sub(r"(['])", "", s)
    s = re.sub(r"[^a-zA-Z0-9,.!?]+", " ", s)
    s = re.sub(r"\s+", " ", s).strip()
    return s


class Vocab:
    def __init__(self, name: str = "vocab"):
        self.name = name
        self.word2index: Dict[str, int] = {}
        self.word2count: Dict[str, int] = {}
        self.index2word: Dict[int, str] = dict(_SPECIALS)
        self.n_words = len(_SPECIALS)
        self.word_embedding_weights: Optional[np.ndarray] = None

    def index_word(self, word: str) -> None:
        if word not in self.word2index:
            self.word2index[word] = self.n_words
            self.word2count[word] = 1
            self.index2word[self.n_words] = word
            self.n_words += 1
        else:
            self.word2count[word] += 1

    def index_words(self, sentence_words: List[str]) -> None:
        for w in sentence_words:
            self.index_word(w)

    def get_word_index(self, word: str) -> int:
        return self.word2index.get(word, UNK)

    def words_to_ids(self, words: List[str], add_sos_eos: bool = True
                     ) -> List[int]:
        ids = [self.get_word_index(w) for w in words]
        if add_sos_eos:
            ids = [SOS] + ids + [EOS]
        return ids

    def trim(self, min_count: int) -> None:
        """Drop words rarer than min_count (ref: vocab.py:118-149)."""
        keep = [w for w, c in self.word2count.items() if c >= min_count]
        self.word2index = {}
        self.word2count = {}
        self.index2word = dict(_SPECIALS)
        self.n_words = len(_SPECIALS)
        for w in keep:
            self.index_word(w)

    # --- embeddings -----------------------------------------------------
    def load_word_vectors(self, path: Optional[str], dim: int = 300) -> None:
        """Build the (n_words, dim) embedding matrix.

        path=None or missing -> deterministic hash fallback; .npy -> load
        directly; anything else -> parsed as .vec text format.
        """
        import os
        if path is not None and os.path.exists(path):
            if path.endswith(".npy"):
                self.word_embedding_weights = np.load(path)
                assert self.word_embedding_weights.shape == (self.n_words,
                                                             dim)
                return
            table = _read_vec_file(path, dim)
        else:
            table = {}
        weights = np.zeros((self.n_words, dim), dtype=np.float32)
        for idx, word in self.index2word.items():
            if word in table:
                weights[idx] = table[word]
            else:
                weights[idx] = _hash_vector(word, dim)
        self.word_embedding_weights = weights

    def state_dict(self) -> dict:
        return {"name": self.name, "word2index": self.word2index,
                "word2count": self.word2count,
                "weights": (None if self.word_embedding_weights is None
                            else self.word_embedding_weights)}

    @classmethod
    def from_state_dict(cls, state: dict) -> "Vocab":
        v = cls(state["name"])
        for w in sorted(state["word2index"], key=state["word2index"].get):
            v.index_word(w)
        v.word2count = dict(state["word2count"])
        w = state.get("weights")
        v.word_embedding_weights = None if w is None else np.asarray(w)
        return v


def _hash_vector(word: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding: seeded by the word's sha1."""
    seed = int.from_bytes(hashlib.sha1(word.encode()).digest()[:8], "little")
    return np.random.default_rng(seed).normal(0, 0.3, dim).astype(np.float32)


def _read_vec_file(path: str, dim: int) -> Dict[str, np.ndarray]:
    table: Dict[str, np.ndarray] = {}
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) != dim + 1:
                continue  # header line or malformed
            table[parts[0]] = np.asarray(parts[1:], dtype=np.float32)
    return table


def build_vocab(name: str, word_lists: List[List[str]],
                embedding_path: Optional[str] = None,
                embedding_dim: int = 300) -> Vocab:
    """Corpus word lists -> Vocab with embedding matrix
    (ref: scripts/utils/vocab_utils.py:31-76)."""
    v = Vocab(name)
    for words in word_lists:
        v.index_words(words)
    v.load_word_vectors(embedding_path, embedding_dim)
    return v

"""Exemplar retrieval: token -> a stored DAE-latent window.

The reference's default text->gesture path retrieves a RANDOM training
window of the predicted token's cluster and plays its motion
(ref: inference_text2embedding.py:413-423, 572-624; random pick at
:606-612). Shared here by the text and audio generators so the
empty-token fallback (nearest populated token by codebook distance)
and the retrieval RNG semantics cannot drift between them.
"""
from __future__ import annotations

import numpy as np


class ExemplarBank:
    """Token -> latent-window lookup over a cluster latent dataset.

    rng: the caller's np.random.Generator — shared so retrieval
    consumes the generator's seeded stream exactly as before the
    extraction (reference semantics: a fresh random pick per token).
    """

    def __init__(self, latent_bank, n_tokens: int,
                 codebook: np.ndarray, rng: np.random.Generator):
        toks = latent_bank["tokens"]
        self._index = [np.where(toks == t)[0] for t in range(n_tokens)]
        self._populated = np.array(
            [t for t in range(n_tokens) if len(self._index[t])])
        self._codebook = np.asarray(codebook)
        self._latents = latent_bank["dae_latents"]
        self._rng = rng

    def latents_for(self, token: int) -> np.ndarray:
        """One exemplar window's DAE latents for a gesture token; an
        unpopulated token falls back to its nearest populated neighbor
        by codebook distance."""
        idxs = self._index[token] if token < len(self._index) \
            else np.array([], np.int64)
        if len(idxs) == 0:
            cb = self._codebook
            pop = self._populated
            d = np.sum((cb[pop] - cb[token]) ** 2, axis=1)
            token = int(pop[np.argmin(d)])
            idxs = self._index[token]
        pick = int(self._rng.choice(idxs))  # ref :606-612 random exemplar
        return self._latents[pick]

"""Exemplar retrieval: token -> a stored DAE-latent window.

The reference's default text->gesture path retrieves a RANDOM training
window of the predicted token's cluster and plays its motion
(ref: inference_text2embedding.py:413-423, 572-624; random pick at
:606-612). Shared here by the text and audio generators so the
empty-token fallback (nearest populated token by codebook distance)
and the retrieval RNG semantics cannot drift between them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
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
        self._resolve_cache: dict = {}
        # boundary frames for continuity-aware retrieval (motion
        # matching): first/last DAE-latent frame of every bank window
        lats = np.asarray(self._latents, np.float32)
        self._first_frames = np.ascontiguousarray(lats[:, 0])
        self._last_frames = np.ascontiguousarray(lats[:, -1])

    def make_decode_fn(self, dae_model, dae_variables):
        """Jitted picks -> motion frames. The latent bank stays
        device-resident and is gathered IN-GRAPH, so only the picked row
        indices cross the tunnel per request, never the gathered latent
        windows. Shared by the text and audio generators so the decode
        half of exemplar retrieval cannot drift between them."""
        bank_dev = jnp.asarray(np.asarray(self._latents, np.float32))

        @jax.jit
        def exemplar_decode(picks):
            lats = jnp.take(bank_dev, picks, axis=0)
            return dae_model.apply(dae_variables,
                                   lats.reshape(-1, lats.shape[-1]),
                                   method=dae_model.decode)

        return exemplar_decode

    def pick_indices(self, tokens) -> np.ndarray:
        """One fresh random pick per token, in order - vectorized.

        Semantics match per-token retrieval (a uniform pick among the
        token's windows, unpopulated tokens resolved to their nearest
        populated neighbor), but the uniforms are drawn as ONE batch:
        per-call np.random.Generator.choice overhead measured ~0.3 ms
        x 1800 tokens = ~0.5 s per 30-minute request, dominating the
        whole exemplar path (benchmarks/README.md round 3)."""
        toks = np.asarray(tokens, np.int64).reshape(-1)
        resolved = np.empty_like(toks)
        sizes = np.empty(len(toks), np.int64)
        for i, t in enumerate(toks):
            t = int(t)
            if t >= len(self._index) or len(self._index[t]) == 0:
                hit = self._resolve_cache.get(t)
                if hit is None:
                    cb, pop = self._codebook, self._populated
                    d = np.sum((cb[pop] - cb[t]) ** 2, axis=1)
                    hit = int(pop[np.argmin(d)])
                    self._resolve_cache[t] = hit
                t = hit
            resolved[i] = t
            sizes[i] = len(self._index[t])
        offs = (self._rng.random(len(toks)) * sizes).astype(np.int64)
        return np.array([self._index[t][o]
                         for t, o in zip(resolved, offs)], np.int32)

    def _resolve(self, t: int) -> int:
        """Map an unpopulated/out-of-range token to its nearest
        populated neighbor by codebook distance (cached)."""
        if t < len(self._index) and len(self._index[t]):
            return t
        hit = self._resolve_cache.get(t)
        if hit is None:
            cb, pop = self._codebook, self._populated
            d = np.sum((cb[pop] - cb[min(t, len(cb) - 1)]) ** 2, axis=1)
            hit = int(pop[np.argmin(d)])
            self._resolve_cache[t] = hit
        return hit

    def pick_indices_continuity(self, tokens,
                                prev_pick: int = -1) -> np.ndarray:
        """Continuity-aware retrieval (motion matching; beyond
        reference): among each token's candidate windows, pick the one
        whose FIRST latent frame is nearest the previous pick's LAST
        latent frame, so consecutive exemplar windows splice with the
        smallest pose jump. The first token (prev_pick < 0 and no
        predecessor) falls back to the reference's uniform random pick.

        Sequential by construction (each pick conditions the next);
        per-step cost is one vectorized distance over that token's
        candidates. prev_pick carries the chain across calls (the
        streaming session threads it between windows)."""
        toks = np.asarray(tokens, np.int64).reshape(-1)
        picks = np.empty(len(toks), np.int32)
        prev = int(prev_pick)
        for i, t in enumerate(toks):
            cand = self._index[self._resolve(int(t))]
            if prev < 0:
                pick = int(cand[self._rng.integers(len(cand))])
            else:
                d = np.sum(
                    (self._first_frames[cand]
                     - self._last_frames[prev]) ** 2, axis=1)
                pick = int(cand[np.argmin(d)])
            picks[i] = pick
            prev = pick
        return picks

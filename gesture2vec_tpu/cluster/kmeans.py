"""K-Means in JAX (Lloyd's algorithm + k-means++ seeding).

Replaces the reference's sklearn KMeans(300) fit over corpus latents
(ref: scripts/Clustering.py:508-726, kwargs at :586-591: n_init=10,
max_iter=300). Batched distance computation rides the MXU; iterations
run under lax.scan so the whole fit is one compiled program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class KMeansResult(NamedTuple):
    centers: jnp.ndarray   # (k, d)
    labels: jnp.ndarray    # (n,)
    inertia: jnp.ndarray   # scalar


def _distances(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=1)
    return x2 + c2 - 2.0 * jnp.matmul(x, centers.T, precision="highest")


def _plusplus_init(key: jax.Array, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding under lax.scan."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]

    def body(carry, key_i):
        centers, i, min_d = carry
        probs = min_d / jnp.maximum(min_d.sum(), 1e-12)
        idx = jax.random.choice(key_i, n, p=probs)
        c = x[idx]
        centers = centers.at[i].set(c)
        d_new = jnp.sum((x - c) ** 2, axis=1)
        return (centers, i + 1, jnp.minimum(min_d, d_new)), None

    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    min_d = jnp.sum((x - first) ** 2, axis=1)
    keys = jax.random.split(key, k - 1)
    (centers, _, _), _ = jax.lax.scan(body, (centers, 1, min_d), keys)
    return centers


def kmeans_fit(x: jnp.ndarray, k: int, *, key: jax.Array = None,
               n_init: int = 10, max_iter: int = 300,
               tol: float = 1e-4) -> KMeansResult:
    """Best-of-n_init Lloyd fits (sklearn-default semantics,
    ref: Clustering.py:586-591)."""
    x = jnp.asarray(x, jnp.float32)
    key = jax.random.PRNGKey(0) if key is None else key

    @jax.jit
    def one_fit(key_i):
        centers0 = _plusplus_init(key_i, x, k)

        def lloyd_step(centers):
            d = _distances(x, centers)
            labels = jnp.argmin(d, axis=1)
            onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)
            counts = onehot.sum(axis=0)
            sums = jnp.matmul(onehot.T, x, precision="highest")
            means = jnp.where(counts[:, None] > 0,
                              sums / jnp.maximum(counts[:, None], 1),
                              centers)
            # sklearn semantics (the reference's engine,
            # Clustering.py:586-591): empty clusters are relocated to
            # the samples farthest from their assigned center
            # (_relocate_empty_clusters), one distinct far point per
            # empty cluster - never left frozen at a dead center.
            point_d = jnp.take_along_axis(d, labels[:, None],
                                          axis=1)[:, 0]
            far = x[jnp.argsort(-point_d)[:k]]          # (<=k, dim)
            empty = counts == 0
            rank = jnp.clip(jnp.cumsum(empty) - 1, 0, far.shape[0] - 1)
            return jnp.where(empty[:, None], far[rank], means)

        def cond(carry):
            _, shift, it = carry
            return jnp.logical_and(it < max_iter, shift > tol)

        def body(carry):
            centers, _, it = carry
            new_centers = lloyd_step(centers)
            shift = jnp.sum((new_centers - centers) ** 2)
            return new_centers, shift, it + 1

        centers, _, _ = jax.lax.while_loop(cond, body,
                                           (centers0, jnp.inf, 0))
        d = _distances(x, centers)
        labels = jnp.argmin(d, axis=1)
        inertia = jnp.sum(jnp.take_along_axis(d, labels[:, None], axis=1))
        return centers, labels, inertia

    best = None
    for key_i in jax.random.split(key, n_init):
        centers, labels, inertia = one_fit(key_i)
        if best is None or float(inertia) < float(best[2]):
            best = (centers, labels, inertia)
    return KMeansResult(*best)


def kmeans_predict(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmin(_distances(jnp.asarray(x, jnp.float32),
                                 jnp.asarray(centers, jnp.float32)), axis=1)


def save_kmeans(path: str, result: KMeansResult) -> None:
    np.savez(path, centers=np.asarray(result.centers),
             inertia=np.asarray(result.inertia))


def load_kmeans(path: str) -> np.ndarray:
    with np.load(path) as z:
        return z["centers"]

"""GPipe pipeline parallelism over the "pp" mesh axis.

The reference is single-GPU (SURVEY.md section 2.8); pipeline support is
a new TPU-native capability (parallel/pipeline.py). These tests pin the
combinator's contract on the 8-device virtual mesh: forward identity vs
the sequential stage composition, gradient identity through the
scan/ppermute/psum schedule, composition with a dp axis, and the deep
GRU-stack application built on models/gru.gru_layer.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture2vec_tpu.parallel.mesh import make_mesh
from gesture2vec_tpu.parallel.pipeline import (gpipe, gpipe_fn,
                                               pipelined_gru_stack,
                                               stack_stages)

H, B, S, M = 16, 8, 4, 4  # width, batch, stages, microbatches


def _dense_stages(rng):
    Ws = [jnp.asarray(rng.normal(size=(H, H), scale=0.3)
                      .astype(np.float32)) for _ in range(S)]
    bs = [jnp.asarray(rng.normal(size=(H,), scale=0.1)
                      .astype(np.float32)) for _ in range(S)]
    stacked = stack_stages([{"w": w, "b": b} for w, b in zip(Ws, bs)])
    return Ws, bs, stacked


def _stage(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _sequential(Ws, bs, x):
    for w, b in zip(Ws, bs):
        x = jnp.tanh(x @ w + b)
    return x


def test_gpipe_matches_sequential(rng):
    Ws, bs, stacked = _dense_stages(rng)
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    mesh = make_mesh({"pp": S})
    y = jax.jit(gpipe_fn(_stage, mesh, n_micro=M))(stacked, x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_sequential(Ws, bs, x)),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_gradients_match_sequential(rng):
    """Reverse-mode AD through the pipeline schedule must produce the
    same parameter gradients as the plain composition (GPipe is exact,
    not an approximation)."""
    Ws, bs, stacked = _dense_stages(rng)
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    mesh = make_mesh({"pp": S})
    f = gpipe_fn(_stage, mesh, n_micro=M)

    def loss_pp(sp):
        return jnp.mean((f(sp, x) - tgt) ** 2)

    def loss_seq(sp):
        y = x
        for i in range(S):
            y = _stage(jax.tree_util.tree_map(lambda l: l[i], sp), y)
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gpipe_composes_with_dp(rng):
    """dp=2 x pp=4: microbatches additionally batch-sharded over dp."""
    Ws, bs, stacked = _dense_stages(rng)
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    mesh = make_mesh({"dp": 2, "pp": 4})
    y = jax.jit(gpipe_fn(_stage, mesh, n_micro=M))(stacked, x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_sequential(Ws, bs, x)),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_rejects_indivisible_batch(rng):
    _, _, stacked = _dense_stages(rng)
    x = jnp.zeros((B + 1, H), jnp.float32)
    mesh = make_mesh({"pp": S})
    with pytest.raises(ValueError, match="n_micro"):
        gpipe(_stage, stacked, x, mesh=mesh, n_micro=M)


def test_pipelined_gru_stack_matches_sequential(rng):
    """One GRU layer per stage == the sequential deep stack
    (models/gru.gru_layer semantics, zero initial hidden)."""
    from gesture2vec_tpu.models.gru import gru_layer

    T = 6
    layers = []
    for _ in range(S):
        layers.append({
            "w_ih": jnp.asarray(rng.normal(size=(3 * H, H), scale=0.2)
                                .astype(np.float32)),
            "w_hh": jnp.asarray(rng.normal(size=(3 * H, H), scale=0.2)
                                .astype(np.float32)),
            "b_ih": jnp.asarray(rng.normal(size=(3 * H,), scale=0.05)
                                .astype(np.float32)),
            "b_hh": jnp.asarray(rng.normal(size=(3 * H,), scale=0.05)
                                .astype(np.float32)),
        })
    stacked = stack_stages(layers)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))

    ref = jnp.swapaxes(x, 0, 1)
    for w in layers:
        ref, _ = gru_layer(ref, jnp.zeros((B, H), jnp.float32),
                           w["w_ih"], w["w_hh"], w["b_ih"], w["b_hh"])
    ref = jnp.swapaxes(ref, 0, 1)

    mesh = make_mesh({"pp": S})
    y = pipelined_gru_stack(x, stacked, mesh=mesh, n_micro=M)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

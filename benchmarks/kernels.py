"""Microbenchmarks: Pallas kernels vs XLA (jnp) on the default backend.

Run on TPU: python benchmarks/kernels.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.models.gru import gru_layer
from gesture2vec_tpu.models.vq import codebook_distances
from gesture2vec_tpu.ops.gru_pallas import gru_sequence_fused
from gesture2vec_tpu.ops.vq_pallas import vq_argmin


def _sync(out):
    """Hard sync by fetching one scalar: block_until_ready on the axon
    platform returns before device completion (benchmarks/README.md),
    so timing with it under-reports device time."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_vq():
    rng = np.random.default_rng(0)
    for n in (2048, 65536):
        x = jnp.asarray(rng.normal(size=(n, 400)).astype(np.float32))
        cb = jnp.asarray(rng.normal(size=(512, 400)).astype(np.float32))

        @jax.jit
        def xla(xv, cbv):
            d = codebook_distances(xv, cbv)
            return jnp.argmin(d, axis=1), jnp.min(d, axis=1)

        t_xla = timeit(xla, x, cb)
        t_pl = timeit(lambda a, b: vq_argmin(a, b), x, cb)
        i1, _ = xla(x, cb)
        i2, _ = vq_argmin(x, cb)
        agree = float(jnp.mean((i1 == i2).astype(jnp.float32)))
        print(f"vq_argmin n={n}: xla {t_xla*1e6:.0f}us  "
              f"pallas {t_pl*1e6:.0f}us  speedup {t_xla/t_pl:.2f}x  "
              f"token agreement {agree:.4f}")


def bench_gru():
    from gesture2vec_tpu.ops.gru_pallas import supported

    rng = np.random.default_rng(0)
    for (T, B, H) in ((20, 128, 200), (120, 256, 200)):
        if not supported(T, B, H):
            # the kernel pins the whole sequence in VMEM; shapes past
            # the budget crash with RESOURCE_EXHAUSTED instead of
            # falling back, so skip them like production callers do
            print(f"gru T={T} B={B} H={H}: skipped "
                  "(gru_pallas.supported()=False, VMEM budget)")
            continue
        xp = jnp.asarray(rng.normal(size=(T, B, 3 * H)).astype(np.float32))
        h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
        w_hh = jnp.asarray(rng.normal(size=(3 * H, H)).astype(np.float32)
                           * 0.1)
        b_hh = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32))
        w_ih = jnp.eye(3 * H, dtype=jnp.float32)  # x_proj precomputed
        b_ih = jnp.zeros((3 * H,), jnp.float32)

        @jax.jit
        def xla(xpv, h0v):
            return gru_layer(xpv, h0v, w_ih, w_hh, b_ih, b_hh)

        t_xla = timeit(xla, xp, h0)
        t_pl = timeit(lambda a, b: gru_sequence_fused(a, b, w_hh, b_hh),
                      xp, h0)
        y1, _ = xla(xp, h0)
        y2, _ = gru_sequence_fused(xp, h0, w_hh, b_hh)
        err = float(jnp.max(jnp.abs(y1 - y2)))
        print(f"gru T={T} B={B} H={H}: xla {t_xla*1e6:.0f}us  "
              f"pallas {t_pl*1e6:.0f}us  speedup {t_xla/t_pl:.2f}x  "
              f"max err {err:.2e}")




def bench_fused_decoder():
    import jax.random as jr
    from gesture2vec_tpu.ops.decoder_pallas import fused_chunk_decode
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state,
                                                      make_seq_ae)

    cfg = load_config(dict(name="f", model="seq2seq", hidden_size=200,
                           n_layers=2, dropout_prob=0.1, epochs=1,
                           batch_size=8, rep_learning_dim=40, n_poses=20,
                           n_pre_poses=1, autoencoder_vq=True,
                           autoencoder_vq_components=512, random_seed=0))
    model = make_seq_ae(cfg)
    st = init_state(cfg, model, jr.PRNGKey(0), make_optimizer(1e-3))
    variables = {"params": st.params, "batch_stats": st.batch_stats}
    rng = np.random.default_rng(0)
    for B in (1, 150):
        h0 = jnp.asarray(rng.normal(size=(2, B, 200)).astype(np.float32))
        seed = jnp.asarray(rng.normal(size=(B, 40)).astype(np.float32))
        seed_seq = jnp.tile(seed[:, None, :], (1, 20, 1))

        @jax.jit
        def xla(h, s):
            return model.apply(variables, h, s, None, method=model.decode)

        t_xla = timeit(xla, h0, seed_seq)
        t_pl = timeit(lambda h, s: fused_chunk_decode(
            s, h, st.params["decoder_step"],
            st.batch_stats["decoder_step"], n_steps=19), h0, seed)
        y1 = np.asarray(xla(h0, seed_seq))[:, 1:, :]
        y2 = np.transpose(np.asarray(fused_chunk_decode(
            seed, h0, st.params["decoder_step"],
            st.batch_stats["decoder_step"], n_steps=19)), (1, 0, 2))
        err = np.abs(y1 - y2).max()
        print(f"chunk decoder B={B}: xla {t_xla*1e6:.0f}us  "
              f"pallas {t_pl*1e6:.0f}us  speedup {t_xla/t_pl:.2f}x  "
              f"max err {err:.2e}")


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform)
    bench_vq()
    bench_gru()
    bench_fused_decoder()

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


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
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
    rng = np.random.default_rng(0)
    for (T, B, H) in ((20, 128, 200), (120, 256, 200)):
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


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform)
    bench_vq()
    bench_gru()

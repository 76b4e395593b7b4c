"""Pallas kernel verdicts at their claimed winning regimes (round 4).

Round 3 measured all three Pallas kernels (ops/{vq,gru,decoder}_pallas)
at parity with XLA on small/medium shapes. Each kernel's docstring
claims a regime where fusion should pay; this harness measures exactly
those regimes, INTERLEAVED in one process (CLAUDE.md measurement
discipline: A/B/A alternation per rep, min per variant — never compare
timings from different processes):

  vq_argmin     corpus-tokenization sweeps: N = 2^20 flat vectors,
                D = 400 (the Part-b L*H flatten), K in {512, 2048} —
                the (N, K) fp32 distance matrix is 2-8 GB, the
                HBM-materialization regime ops/vq_pallas.py:1-14 names.
  gru fused     B = 1024 bf16 training shapes (T=20, H=200) — plus a
                sweep to the largest supported() batch, since the
                kernel pins the whole sequence in VMEM.
  chunk decoder B = 1024 decode rollout (T=19, H=200, D=40).

Output: one verdict row per kernel for benchmarks/README ("wins at X
by Y%" or "retired: parity everywhere").

Run on TPU: python benchmarks/kernel_verdicts.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def interleaved_ab(fn_a, fn_b, reps=7, warmup=2):
    """A/B/A alternation in one process; returns (min_a, min_b)."""
    for _ in range(warmup):
        _sync(fn_a())
        _sync(fn_b())
    ta, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn_a())
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(fn_b())
        tb.append(time.perf_counter() - t0)
    return float(np.min(ta)), float(np.min(tb))


def verdict_vq(results):
    from gesture2vec_tpu.models.vq import codebook_distances
    from gesture2vec_tpu.ops.vq_pallas import vq_argmin

    rng = np.random.default_rng(0)
    N, D = 1 << 20, 400
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    for K in (512, 2048):
        cb = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))

        @jax.jit
        def xla(xv, cbv):
            d = codebook_distances(xv, cbv)
            return jnp.argmin(d, axis=1), jnp.min(d, axis=1)

        t_xla, t_pl = interleaved_ab(lambda: xla(x, cb),
                                     lambda: vq_argmin(x, cb))
        i1, _ = xla(x, cb)
        i2, _ = vq_argmin(x, cb)
        agree = float(jnp.mean((i1 == i2).astype(jnp.float32)))
        row = {"kernel": "vq_argmin", "N": N, "D": D, "K": K,
               "xla_ms": t_xla * 1e3, "pallas_ms": t_pl * 1e3,
               "speedup": t_xla / t_pl, "token_agreement": agree}
        results.append(row)
        print(f"vq_argmin N=2^20 K={K}: xla {t_xla*1e3:.1f}ms  "
              f"pallas {t_pl*1e3:.1f}ms  speedup {t_xla/t_pl:.2f}x  "
              f"agreement {agree:.4f}")


def verdict_gru(results):
    from gesture2vec_tpu.models.gru import gru_layer
    from gesture2vec_tpu.ops.gru_pallas import gru_sequence_fused, supported

    rng = np.random.default_rng(0)
    T, H = 20, 200
    for B in (1024, 512, 256, 128):
        if not supported(T, B, H):
            results.append({"kernel": "gru_fused", "T": T, "B": B,
                            "H": H, "verdict": "unsupported (VMEM)"})
            print(f"gru T={T} B={B} H={H}: unsupported "
                  f"(whole sequence exceeds the VMEM budget)")
            continue
        xp = jnp.asarray(rng.normal(size=(T, B, 3 * H))
                         .astype(np.float32))
        h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
        w_hh = jnp.asarray(rng.normal(size=(3 * H, H))
                           .astype(np.float32) * 0.1)
        b_hh = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32))
        w_ih = jnp.eye(3 * H, dtype=jnp.float32)
        b_ih = jnp.zeros((3 * H,), jnp.float32)

        @jax.jit
        def xla(xpv, h0v):
            return gru_layer(xpv, h0v, w_ih, w_hh, b_ih, b_hh)

        t_xla, t_pl = interleaved_ab(
            lambda: xla(xp, h0),
            lambda: gru_sequence_fused(xp, h0, w_hh, b_hh))
        y1, _ = xla(xp, h0)
        y2, _ = gru_sequence_fused(xp, h0, w_hh, b_hh)
        err = float(jnp.max(jnp.abs(y1 - y2)))
        results.append({"kernel": "gru_fused", "T": T, "B": B, "H": H,
                        "xla_ms": t_xla * 1e3, "pallas_ms": t_pl * 1e3,
                        "speedup": t_xla / t_pl, "max_err": err})
        print(f"gru T={T} B={B} H={H}: xla {t_xla*1e3:.2f}ms  "
              f"pallas {t_pl*1e3:.2f}ms  speedup {t_xla/t_pl:.2f}x  "
              f"err {err:.2e}")


def verdict_decoder(results):
    import jax.random as jr

    from gesture2vec_tpu.ops.decoder_pallas import fused_chunk_decode
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state,
                                                      make_seq_ae)

    cfg = load_config(dict(name="f", model="seq2seq", hidden_size=200,
                           n_layers=2, dropout_prob=0.1, epochs=1,
                           batch_size=8, rep_learning_dim=40,
                           n_poses=20, n_pre_poses=1, autoencoder_vq=True,
                           autoencoder_vq_components=512, random_seed=0))
    model = make_seq_ae(cfg)
    st = init_state(cfg, model, jr.PRNGKey(0), make_optimizer(1e-3))
    variables = {"params": st.params, "batch_stats": st.batch_stats}
    rng = np.random.default_rng(0)
    for B in (1024, 150):
        h0 = jnp.asarray(rng.normal(size=(2, B, 200)).astype(np.float32))
        seed = jnp.asarray(rng.normal(size=(B, 40)).astype(np.float32))
        seed_seq = jnp.tile(seed[:, None, :], (1, 20, 1))

        @jax.jit
        def xla(h, s):
            return model.apply(variables, h, s, None,
                               method=model.decode)

        t_xla, t_pl = interleaved_ab(
            lambda: xla(h0, seed_seq),
            lambda: fused_chunk_decode(
                seed, h0, st.params["decoder_step"],
                st.batch_stats["decoder_step"], n_steps=19))
        y1 = np.asarray(xla(h0, seed_seq))[:, 1:, :]
        y2 = np.transpose(np.asarray(fused_chunk_decode(
            seed, h0, st.params["decoder_step"],
            st.batch_stats["decoder_step"], n_steps=19)), (1, 0, 2))
        err = float(np.abs(y1 - y2).max())
        results.append({"kernel": "chunk_decoder", "B": B,
                        "xla_ms": t_xla * 1e3, "pallas_ms": t_pl * 1e3,
                        "speedup": t_xla / t_pl, "max_err": err})
        print(f"chunk decoder B={B}: xla {t_xla*1e3:.2f}ms  "
              f"pallas {t_pl*1e3:.2f}ms  speedup {t_xla/t_pl:.2f}x  "
              f"err {err:.2e}")


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform)
    results = []
    verdict_vq(results)
    verdict_gru(results)
    verdict_decoder(results)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "kernel_verdicts.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)

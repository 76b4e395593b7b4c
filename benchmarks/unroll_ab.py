"""Interleaved A/B for the scan_unroll knob (benchmarks/train_step.py
measures one setting per process; on a shared host that drifts). Here
both step functions are compiled in ONE process and timed alternately
A-B-A-B..., so load drift hits both sides equally. Reports per-rep
times and medians.

    python benchmarks/unroll_ab.py [--part b|b16|d] [--u 4] [--reps 5]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.optim import make_optimizer


def build_b(unroll, batch, compute_dtype):
    from gesture2vec_tpu.train import seq_ae_trainer

    cfg = load_config(dict(name=f"ab_u{unroll}", model="seq2seq",
                           hidden_size=200, n_layers=2, dropout_prob=0.2,
                           rep_learning_dim=40, n_poses=20, n_pre_poses=1,
                           autoencoder_vq=True,
                           autoencoder_vq_components=512,
                           learning_rate=5e-4, epochs=1, batch_size=batch,
                           random_seed=0, compute_dtype=compute_dtype,
                           scan_unroll=unroll))
    model = seq_ae_trainer.make_seq_ae(cfg)   # sets the unroll global
    opt = make_optimizer(cfg.learning_rate)
    state = seq_ae_trainer.init_state(cfg, model, jax.random.PRNGKey(0),
                                      opt)
    step = seq_ae_trainer.make_train_step(cfg, model, opt, total_epochs=1)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 20, 40)).astype(np.float32))
    args = (x, jax.random.PRNGKey(1), jnp.asarray(0.0))
    return step, state, args


def build_d(unroll, batch):
    from gesture2vec_tpu.train import text2token_trainer

    cfg = load_config(dict(name=f"ab_u{unroll}", model="seq2seq",
                           hidden_size=200, n_layers=2, dropout_prob=0.2,
                           n_poses=20, n_pre_poses=1, wordembed_dim=300,
                           sentence_frame_length=80,
                           autoencoder_vq_components=512,
                           learning_rate=5e-4, epochs=1, batch_size=batch,
                           random_seed=0, scan_unroll=unroll))
    model = text2token_trainer.make_text2token(cfg, n_words=8000)
    opt = make_optimizer(cfg.learning_rate)
    state = text2token_trainer.init_state(model, jax.random.PRNGKey(0),
                                          opt, max_words=32)
    step = text2token_trainer.make_train_step(model, opt)
    rng = np.random.default_rng(0)
    args = (jnp.asarray(rng.integers(4, 8000, size=(batch, 32),
                                     dtype=np.int32)),
            jnp.asarray(rng.integers(8, 32, size=batch, dtype=np.int32)),
            jnp.asarray(rng.integers(0, 512, size=(batch, model.n_steps),
                                     dtype=np.int32)),
            jax.random.PRNGKey(1))
    return step, state, args


def timed(step, state, args, iters):
    """Returns (s/step, new_state). The step donates its state arg, so
    the caller must thread the returned state into the next rep."""
    for _ in range(3):
        state, metrics = step(state, *args)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, *args)
    _ = float(metrics["loss"])
    return (time.perf_counter() - t0) / iters, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="b", choices=["b", "b16", "d"])
    ap.add_argument("--u", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    def force_trace(built):
        """Compile NOW, while this side's build just set the trace-time
        _SCAN_UNROLL global: jax.jit traces lazily, so without this the
        first timed() call of side A would trace under side B's global
        and both sides would lower to identical HLO (the bug that made
        an earlier revision of this A/B compare a program to itself).
        Donation means the warm call must run on a copy of the state.
        Returns the lowered HLO text for the identity sanity check -
        it must be captured here, while this side's global is live."""
        step, state, args_ = built
        text = step.lower(state, *args_).as_text()
        st = jax.tree_util.tree_map(jnp.copy, state)
        _, metrics = step(st, *args_)
        _ = float(metrics["loss"])
        return built, text

    if args.part == "d":
        a, hlo_a = force_trace(build_d(1, args.batch))
        b, hlo_b = force_trace(build_d(args.u, args.batch))
    else:
        dt = "bfloat16" if args.part == "b16" else "float32"
        a, hlo_a = force_trace(build_b(1, args.batch, dt))
        b, hlo_b = force_trace(build_b(args.u, args.batch, dt))

    (step_a, state_a, args_a) = a
    (step_b, state_b, args_b) = b
    # sanity: the two sides must actually differ (unroll >= 2 changes
    # the lowered scan structure); identical HLO means the knob was not
    # applied and any "speedup" below would be pure noise
    if args.u != 1 and hlo_a == hlo_b:
        raise SystemExit("A/B invalid: both sides lowered to identical "
                         "HLO - the unroll knob was not applied")
    ta, tb = [], []
    for rep in range(args.reps):
        dt, state_a = timed(step_a, state_a, args_a, args.iters)
        ta.append(dt)
        dt, state_b = timed(step_b, state_b, args_b, args.iters)
        tb.append(dt)
        print(f"rep {rep}: u1 {ta[-1]*1e3:6.2f} ms | "
              f"u{args.u} {tb[-1]*1e3:6.2f} ms", flush=True)
    ma, mb = np.median(ta), np.median(tb)
    print(f"median: u1 {ma*1e3:.2f} ms  u{args.u} {mb*1e3:.2f} ms  "
          f"speedup {ma/mb:.2f}x")


if __name__ == "__main__":
    main()

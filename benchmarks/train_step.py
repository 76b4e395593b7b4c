"""Microbenchmark: jitted training-step throughput for parts a, b, d.

Measures steady-state optimization steps/s (and samples/s) of the real
jitted train steps at production shapes, threading the donated train
state exactly like the training loop does. Run on TPU:

    python benchmarks/train_step.py [--batch 128] [--iters 30]

The reference's training loop is torch on GPU/CPU with a Python-level
batch loop (ref: scripts/train_DAE.py / train_Autoencoder_VQVAE.py /
train_text2embedding.py); here each step is one fused XLA program.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.optim import make_optimizer
from gesture2vec_tpu.utils import flops as F


def _report(label, batch, t, unit, step_fn, state, args, fwd_analytic):
    """One result line with FLOPs and MFU (vs v5e bf16 peak).

    MFU denominator: the ANALYTIC step count, 3x the analytic forward
    (backward ~= 2x forward; the Adam update adds no matmuls). XLA's
    cost model is printed alongside but counts each lax.scan/while BODY
    ONCE, so at the production scan_unroll=1 it undercounts these
    recurrent steps severalfold (tests/test_flops.py pins this down);
    it stays useful as a sanity lower bound.
    """
    try:
        xla_step = F.xla_flops(step_fn, state, *args)
    except Exception:                       # cost model unavailable
        xla_step = 0.0
    step_flops = 3.0 * fwd_analytic
    util = F.mfu(step_flops, t)
    print(f"{label} batch {batch}: {t*1e3:7.2f} ms/step "
          f"{batch/t:10.0f} {unit}  "
          f"{step_flops/1e9:8.3f} GFLOP/step (analytic 3x fwd; "
          f"XLA scan-body-once lower bound {xla_step/1e9:.3f})  "
          f"MFU {util*100:5.2f}% of v5e bf16 peak")


def bench_steps(step_fn, state, args, iters, warmup=5):
    """Thread state through step_fn (donated arg 0) and return aggregate
    s/step over a chained run with ONE final host sync.

    Per-iteration block_until_ready is deliberately avoided: on the axon
    tunnel it under-reports (returns before device completion), and
    per-step float() sync instead measures the ~34ms tunnel RTT. The
    chained measurement matches how the real trainers run (async
    dispatch, deferred metric sync)."""
    for _ in range(warmup):
        state, metrics = step_fn(state, *args)
    _ = float(metrics["loss"])  # hard sync: warmup + compile done
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, *args)
    _ = float(metrics["loss"])  # hard sync: all iters complete
    return (time.perf_counter() - t0) / iters


def bench_dae(batch_size, iters, unroll=1):
    from gesture2vec_tpu.train import dae_trainer

    cfg = load_config(dict(name="bench_dae", model="DAE", hidden_size=40,
                           input_motion_dim=135, dropout_prob=0.2,
                           learning_rate=5e-4, epochs=1,
                           batch_size=batch_size, random_seed=0,
                           scan_unroll=unroll))
    model = dae_trainer.make_frame_model(cfg)
    opt = make_optimizer(cfg.learning_rate)
    state = dae_trainer.init_state(cfg, model, jax.random.PRNGKey(0), opt)
    step = dae_trainer.make_train_step(cfg, model, opt)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch_size, 135)).astype(np.float32))
    args_ = (x, jax.random.PRNGKey(1))
    t = bench_steps(step, state, args_, iters)
    _report("part a (DAE 135->40)     ", batch_size, t, "frames/s",
            step, state, args_,
            F.dae_forward_flops(batch_size))


def bench_seq_ae(batch_size, iters, compute_dtype="float32",
                 unroll=1, arch="bigru"):
    from gesture2vec_tpu.train import seq_ae_trainer

    cfg = load_config(dict(name="bench_b", model="seq2seq",
                           hidden_size=200, n_layers=2, dropout_prob=0.2,
                           rep_learning_dim=40, n_poses=20, n_pre_poses=1,
                           autoencoder_vq=True,
                           autoencoder_vq_components=512,
                           learning_rate=5e-4, epochs=1,
                           batch_size=batch_size, random_seed=0,
                           loss_l1_weight=5, loss_cont_weight=0.1,
                           loss_var_weight=0.5,
                           compute_dtype=compute_dtype,
                           seq_arch=arch,
                           scan_unroll=unroll))
    model = seq_ae_trainer.make_seq_ae(cfg)
    opt = make_optimizer(cfg.learning_rate)
    state = seq_ae_trainer.init_state(cfg, model, jax.random.PRNGKey(0),
                                      opt)
    step = seq_ae_trainer.make_train_step(cfg, model, opt, total_epochs=1)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch_size, 20, 40)).astype(np.float32))
    args_ = (x, jax.random.PRNGKey(1), jnp.asarray(0.0))
    t = bench_steps(step, state, args_, iters)
    tag = " bf16" if compute_dtype == "bfloat16" else ""
    label = (f"part b tf-encoder{tag}    " if arch == "transformer"
             else f"part b (VQ-VAE tokenizer{tag})")
    _report(label, batch_size, t, "windows/s",
            step, state, args_,
            F.seq_ae_forward_flops(batch_size, encoder=arch))


def bench_t2t(batch_size, iters, max_words=32, unroll=1,
              compute_dtype="float32", arch="gru"):
    from gesture2vec_tpu.train import text2token_trainer

    cfg = load_config(dict(name="bench_d", model="seq2seq",
                           hidden_size=200, n_layers=2, dropout_prob=0.2,
                           n_poses=20, n_pre_poses=1, wordembed_dim=300,
                           sentence_frame_length=80,
                           autoencoder_vq_components=512,
                           learning_rate=5e-4, epochs=1,
                           batch_size=batch_size, random_seed=0,
                           scan_unroll=unroll,
                           t2t_arch=arch,
                           compute_dtype=compute_dtype))
    model = text2token_trainer.make_text2token(cfg, n_words=8000)
    opt = make_optimizer(cfg.learning_rate)
    state = text2token_trainer.init_state(model, jax.random.PRNGKey(0),
                                          opt, max_words=max_words)
    step = text2token_trainer.make_train_step(model, opt)
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(4, 8000,
                                     size=(batch_size, max_words),
                                     dtype=np.int32))
    lens = jnp.asarray(rng.integers(8, max_words, size=batch_size,
                                    dtype=np.int32))
    tgt = jnp.asarray(rng.integers(0, 512,
                                   size=(batch_size, model.n_steps),
                                   dtype=np.int32))
    args_ = (words, lens, tgt, jax.random.PRNGKey(1))
    t = bench_steps(step, state, args_, iters)
    tag = " bf16" if compute_dtype == "bfloat16" else "     "
    if arch == "transformer":
        fwd = F.transformer_t2t_forward_flops(batch_size,
                                              max_words=max_words,
                                              n_steps=model.n_steps)
        label = f"part d transformer{tag}"
    else:
        fwd = F.text2token_forward_flops(batch_size, max_words=max_words,
                                         n_steps=model.n_steps)
        label = f"part d (text->tokens{tag})"
    _report(label, batch_size, t, "sentences/s", step, state, args_, fwd)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--unroll", type=int, default=1,
                    help="GRU/decoder scan unroll factor (A/B knob)")
    ap.add_argument("--parts", default="a,b,b16,d,d16",
                    help="comma list from {a,b,b16,bt,bt16,d,d16,"
                         "dt,dt16}")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.unroll != 1:
        print(f"scan unroll: {args.unroll}")
    print(f"backend: {jax.default_backend()}  devices: "
          f"{len(jax.devices())}")
    parts = set(args.parts.split(","))
    if "a" in parts:
        bench_dae(args.batch, args.iters, unroll=args.unroll)
    if "b" in parts:
        bench_seq_ae(args.batch, args.iters, unroll=args.unroll)
    if "b16" in parts:
        bench_seq_ae(args.batch, args.iters, compute_dtype="bfloat16",
                     unroll=args.unroll)
    if "bt" in parts:
        bench_seq_ae(args.batch, args.iters, arch="transformer")
    if "bt16" in parts:
        bench_seq_ae(args.batch, args.iters, arch="transformer",
                     compute_dtype="bfloat16")
    if "d" in parts:
        bench_t2t(args.batch, args.iters, unroll=args.unroll)
    if "d16" in parts:
        bench_t2t(args.batch, args.iters, unroll=args.unroll,
                  compute_dtype="bfloat16")
    if "dt" in parts:
        bench_t2t(args.batch, args.iters, arch="transformer")
    if "dt16" in parts:
        bench_t2t(args.batch, args.iters, arch="transformer",
                  compute_dtype="bfloat16")


if __name__ == "__main__":
    main()

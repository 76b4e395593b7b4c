"""Mesh weak-scaling measurement for the part-b training step.

Usage:
    python benchmarks/mesh_scaling.py [--devices 8] [--per-device 64]
        [--virtual]

With --virtual (or when the live backend has one device) the benchmark
provisions an N-virtual-device CPU platform in a subprocess - this
validates the sharded program's semantics and collective structure, NOT
speed (all "devices" share this machine's one core). On real multi-chip
TPU hardware the same script measures true weak scaling: per-device
batch is held constant, the global batch grows with dp, and the
reported efficiency is steps/s(dp=N) / steps/s(dp=1) (ideal = 1.0,
since each step does N x the work of the dp=1 step).

Multi-chip plan (documented for when hardware is attached): dp shards
the batch, gradients psum over ICI (inserted by jit's partitioner); the
only other collective is the all-gather of tp-sharded codebook/vocab
rows. At these model sizes (<2 MB of params) per-step comms is ~KBs per
device pair, so weak-scaling efficiency should stay near 1.0 until the
per-device batch is too small to fill the MXU.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def measure(dp: int, per_device: int, iters: int = 20) -> float:
    """steps/s for the part-b train step on a dp-way mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    from gesture2vec_tpu.train import seq_ae_trainer as S
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.optim import make_optimizer

    cfg = load_config(dict(
        name="scal", model="seq2seq", hidden_size=200, n_layers=2,
        dropout_prob=0.2, epochs=1, batch_size=per_device * dp,
        learning_rate=5e-4, rep_learning_dim=40, n_poses=20,
        n_pre_poses=1, autoencoder_vq=True, autoencoder_vq_components=512,
        random_seed=0, mesh_shape={"dp": dp} if dp > 1 else None))
    model = S.make_seq_ae(cfg)
    opt = make_optimizer(cfg.learning_rate)
    state = S.init_state(cfg, model, jax.random.PRNGKey(0), opt)
    mesh, state = prepare_state(state, cfg.mesh_shape)
    place = batch_placer(mesh)
    step = S.make_train_step(cfg, model, opt, 1)
    x = place(np.random.default_rng(0).normal(
        size=(cfg.batch_size, 20, 40)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    state, m = step(state, x, rng, jnp.asarray(0.0))
    float(m["loss"])  # sync: compile done
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, x, rng, jnp.asarray(0.0))
    float(m["loss"])  # sync: all steps complete
    return iters / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per-device", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--virtual", action="store_true")
    args = ap.parse_args()

    if os.environ.get("_G2V_SCALING_INNER") != "1":
        import jax
        have = jax.local_device_count()
        if args.virtual or have < args.devices:
            env = dict(os.environ)
            env["_G2V_SCALING_INNER"] = "1"
            flags = " ".join(
                f for f in env.get("XLA_FLAGS", "").split()
                if not f.startswith(
                    "--xla_force_host_platform_device_count"))
            env["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count"
                f"={args.devices}").strip()
            print(f"(re-exec with {args.devices} virtual CPU devices - "
                  f"semantics/collective check, not a speed measurement)")
            sys.exit(subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.config.update('jax_platforms','cpu');"
                 "import runpy, sys; sys.argv=" +
                 repr([__file__] + sys.argv[1:]) + ";"
                 "runpy.run_path(sys.argv[0], run_name='__main__')"],
                env=env).returncode)

    import jax
    print(f"backend: {jax.default_backend()}, devices: "
          f"{jax.local_device_count()}, per-device batch "
          f"{args.per_device}")
    base = None
    dp = 1
    while dp <= args.devices:
        sps = measure(dp, args.per_device, args.iters)
        base = base or sps
        print(f"dp={dp}: {sps:7.2f} steps/s  "
              f"({sps * args.per_device * dp:9.0f} windows/s, "
              f"weak-scaling efficiency {sps / base:.2f})")
        dp *= 2


if __name__ == "__main__":
    main()

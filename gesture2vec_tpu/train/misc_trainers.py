"""Trainers for the baseline text->pose regressor and the
cluster->gesture decoder.

Rebuilds scripts/train.py (baseline Seq2SeqNet, custom_loss,
ref: train.py:33-110) and scripts/train_cluster2gesture.py
(ref: train_cluster2gesture.py + train_eval/train_seq2seq.py:415-459).
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gesture2vec_tpu.models.gru import set_scan_unroll
from gesture2vec_tpu.models.baseline import Seq2SeqNet
from gesture2vec_tpu.models.c2g import Cluster2Gesture
from gesture2vec_tpu.train import checkpoints
from gesture2vec_tpu.train.config import Config
from gesture2vec_tpu.train.losses import custom_loss
from gesture2vec_tpu.train.optim import make_optimizer
from gesture2vec_tpu.train.token_loop import require_full_batch
from gesture2vec_tpu.utils.meters import AverageMeter


class SimpleTrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jnp.ndarray


def _loop(config: Config, state, train_step, eval_step, batches_fn,
          val_batches_fn, save_fn=None, log_every: int = 50):
    seed = max(config.random_seed, 0)
    rng = jax.random.PRNGKey(seed + 100)
    history: Dict[str, list] = {"train_loss": [], "val_loss": []}
    meter = AverageMeter("loss", ":.4f")
    for epoch in range(config.epochs):
        meter.reset()
        t0 = time.time()
        losses, seen = [], 0
        for i, batch in enumerate(batches_fn(epoch)):
            rng, srng = jax.random.split(rng)
            state, metrics = train_step(state, *batch, srng)
            # losses stay on device between log points (a float() per
            # step is one ~30-90 ms tunnel round-trip each)
            losses.append(metrics["loss"])
            seen += batch[0].shape[0]
            if (i + 1) % log_every == 0:
                block = float(jnp.mean(jnp.stack(losses[-log_every:])))
                meter.update(block, log_every)
                logging.info("EP %d (%d) %s, %.0f samples/s", epoch, i + 1,
                             meter, seen / (time.time() - t0))
        epoch_loss = (float(jnp.mean(jnp.stack(losses)))
                      if losses else float("nan"))
        meter.avg = epoch_loss
        history["train_loss"].append(epoch_loss)
        vl = [float(eval_step(state, *b)) for b in val_batches_fn()]
        history["val_loss"].append(float(np.mean(vl)) if vl
                                   else float("nan"))
        logging.info("EP %d done: train %.5f val %.5f", epoch, meter.avg,
                     history["val_loss"][-1])
        if save_fn:
            save_fn(state, epoch)
    return state, history


# ---------------------------------------------------------------- baseline
def make_baseline(config: Config, n_words: int, pose_dim: int,
                  embedding_weights: Optional[np.ndarray] = None
                  ) -> Seq2SeqNet:
    set_scan_unroll(config.scan_unroll)
    return Seq2SeqNet(n_words=n_words, pose_dim=pose_dim,
                      n_frames=config.n_poses,
                      hidden_size=config.hidden_size,
                      n_layers=config.n_layers,
                      n_pre_poses=config.n_pre_poses,
                      dropout=config.dropout_prob,
                      word_embed_size=config.wordembed_dim,
                      embedding_weights=embedding_weights)


def train_baseline(config: Config, data: Dict[str, np.ndarray],
                   val_data: Dict[str, np.ndarray], n_words: int,
                   embedding_weights=None, save_dir: Optional[str] = None
                   ) -> Tuple[SimpleTrainState, Dict[str, list]]:
    """data: {word_ids (N,S), lengths (N,), poses (N,T,D)}."""
    require_full_batch(data["word_ids"].shape[0], config.batch_size,
                       config.name)
    model = make_baseline(config, n_words, data["poses"].shape[-1],
                          embedding_weights)
    optimizer = make_optimizer(config.learning_rate)
    rng = jax.random.PRNGKey(max(config.random_seed, 0))
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.asarray(data["word_ids"][:2]), jnp.asarray(data["lengths"][:2]),
        jnp.asarray(data["poses"][:2]), train=False)
    state = SimpleTrainState(variables["params"],
                             optimizer.init(variables["params"]),
                             variables.get("batch_stats", {}),
                             jnp.zeros((), jnp.int32))
    # multi-chip: dp-sharded batches, tp row-sharded embedding table
    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    mesh, state = prepare_state(state, config.mesh_shape)
    place = batch_placer(mesh)
    if mesh is not None:
        logging.info("training over mesh %s", config.mesh_shape)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(st, toks, lens, poses, srng):
        def loss_fn(params):
            res, mut = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                toks, lens, poses, train=True, rngs={"dropout": srng},
                mutable=["batch_stats"])
            loss = custom_loss(res["outputs"], poses,
                               l1_weight=config.loss_l1_weight,
                               cont_weight=config.loss_cont_weight,
                               var_weight=config.loss_var_weight)
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn,
                                               has_aux=True)(st.params)
        updates, opt = optimizer.update(grads, st.opt_state, st.params)
        return (SimpleTrainState(optax.apply_updates(st.params, updates),
                                 opt, bs, st.step + 1), {"loss": loss})

    @jax.jit
    def eval_step(st, toks, lens, poses):
        res = model.apply({"params": st.params,
                           "batch_stats": st.batch_stats},
                          toks, lens, poses, train=False)
        return custom_loss(res["outputs"], poses,
                           l1_weight=config.loss_l1_weight,
                           cont_weight=config.loss_cont_weight,
                           var_weight=config.loss_var_weight)

    bs_ = config.batch_size

    def batches(epoch):
        n = data["word_ids"].shape[0]
        perm = np.random.default_rng(
            max(config.random_seed, 0) + epoch).permutation(n)
        for s in range(0, n - bs_ + 1, bs_):
            take = perm[s:s + bs_]
            yield (place(data["word_ids"][take]),
                   place(data["lengths"][take]),
                   place(data["poses"][take]))

    def val_batches():
        n = val_data["word_ids"].shape[0]
        for s in range(0, n - bs_ + 1, bs_):
            yield (place(val_data["word_ids"][s:s + bs_]),
                   place(val_data["lengths"][s:s + bs_]),
                   place(val_data["poses"][s:s + bs_]))

    def save_fn(st, epoch):
        if save_dir and epoch + 1 == config.epochs:
            path = checkpoints.checkpoint_filename(save_dir, config.name,
                                                   epoch + 1)
            checkpoints.save_checkpoint(
                path, config=config, epoch=epoch + 1, params=st.params,
                pose_dim=data["poses"].shape[-1],
                extra={"batch_stats": st.batch_stats,
                       "n_words": n_words}, kind="baseline")

    return _loop(config, state, train_step, eval_step, batches,
                 val_batches, save_fn)


# --------------------------------------------------------------------- c2g
def make_c2g(config: Config, output_size: int) -> Cluster2Gesture:
    set_scan_unroll(config.scan_unroll)
    return Cluster2Gesture(n_clusters=config.autoencoder_vq_components,
                           output_size=output_size,
                           hidden_size=config.hidden_size,
                           n_frames=config.n_poses,
                           n_layers=config.n_layers,
                           dropout=config.dropout_prob)


def train_c2g(config: Config, cluster_ids: np.ndarray,
              target_latents: np.ndarray, val_ids: np.ndarray,
              val_latents: np.ndarray, save_dir: Optional[str] = None
              ) -> Tuple[SimpleTrainState, Dict[str, list]]:
    """cluster_ids (N,), target_latents (N, n_poses, rep_dim)."""
    require_full_batch(cluster_ids.shape[0], config.batch_size,
                       config.name)
    model = make_c2g(config, target_latents.shape[-1])
    optimizer = make_optimizer(config.learning_rate)
    rng = jax.random.PRNGKey(max(config.random_seed, 0))
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.asarray(cluster_ids[:2]), train=False)
    state = SimpleTrainState(variables["params"],
                             optimizer.init(variables["params"]),
                             variables.get("batch_stats", {}),
                             jnp.zeros((), jnp.int32))
    # multi-chip: dp-sharded batches (cluster-id embedding stays small)
    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    mesh, state = prepare_state(state, config.mesh_shape)
    place = batch_placer(mesh)
    if mesh is not None:
        logging.info("training over mesh %s", config.mesh_shape)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(st, ids, latents, srng):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                ids, train=True, rngs={"dropout": srng},
                mutable=["batch_stats"])
            loss = custom_loss(out, latents,
                               l1_weight=config.loss_l1_weight,
                               cont_weight=config.loss_cont_weight,
                               var_weight=config.loss_var_weight)
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn,
                                               has_aux=True)(st.params)
        updates, opt = optimizer.update(grads, st.opt_state, st.params)
        return (SimpleTrainState(optax.apply_updates(st.params, updates),
                                 opt, bs, st.step + 1), {"loss": loss})

    @jax.jit
    def eval_step(st, ids, latents):
        out = model.apply({"params": st.params,
                           "batch_stats": st.batch_stats},
                          ids, train=False)
        return custom_loss(out, latents,
                           l1_weight=config.loss_l1_weight,
                           cont_weight=config.loss_cont_weight,
                           var_weight=config.loss_var_weight)

    bs_ = config.batch_size

    def batches(epoch):
        n = cluster_ids.shape[0]
        perm = np.random.default_rng(
            max(config.random_seed, 0) + epoch).permutation(n)
        for s in range(0, n - bs_ + 1, bs_):
            take = perm[s:s + bs_]
            yield (place(cluster_ids[take]),
                   place(target_latents[take]))

    def val_batches():
        n = val_ids.shape[0]
        for s in range(0, n - bs_ + 1, bs_):
            yield (place(val_ids[s:s + bs_]),
                   place(val_latents[s:s + bs_]))

    def save_fn(st, epoch):
        if save_dir and epoch + 1 == config.epochs:
            path = checkpoints.checkpoint_filename(save_dir, config.name,
                                                   epoch + 1)
            checkpoints.save_checkpoint(
                path, config=config, epoch=epoch + 1, params=st.params,
                pose_dim=target_latents.shape[-1],
                extra={"batch_stats": st.batch_stats}, kind="c2g")

    return _loop(config, state, train_step, eval_step, batches,
                 val_batches, save_fn)


@checkpoints.register_model_kind("baseline")
def _build_baseline(config: Config, payload: dict):
    model = make_baseline(config, int(payload["extra"]["n_words"]),
                          int(payload["pose_dim"]))
    return model, {"params": payload["params"],
                   "batch_stats": payload["extra"].get("batch_stats", {})}


@checkpoints.register_model_kind("c2g")
def _build_c2g(config: Config, payload: dict):
    model = make_c2g(config, int(payload["pose_dim"]))
    return model, {"params": payload["params"],
                   "batch_stats": payload["extra"].get("batch_stats", {})}

"""Shared epoch/val/checkpoint loop for the token-sequence trainers.

Part d's text and audio variants train through one reference loop
(ref: scripts/train_text2embedding.py:166-410 — audio_context only
swaps the encoder, text2embedding_model.py:563-571); here the loop is
likewise shared: text2token_trainer and audio2token_trainer provide
their jitted steps, batch field names, and a checkpoint writer, and
this module owns the permutation/batching, deferred metric syncs,
val sweep, and save cadence.
"""
from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.train.config import Config
from gesture2vec_tpu.utils.meters import AverageMeter


def require_full_batch(n: int, batch_size: int, part: str) -> None:
    """Fail fast instead of silently training zero batches per epoch:
    every trainer loop drops the trailing partial batch, so a dataset
    smaller than batch_size would log NaN losses and checkpoint
    untrained parameters without any error."""
    if n < batch_size:
        raise ValueError(
            f"{part} training needs at least one full batch: "
            f"{n} samples < batch_size {batch_size} "
            f"(lower config.batch_size or provide more data)")


def run_token_training(config: Config, state: Any, rng: jax.Array,
                       start_epoch: int,
                       fields: Sequence[str],
                       data: Dict[str, np.ndarray],
                       val_data: Dict[str, np.ndarray],
                       train_step: Callable, eval_step: Callable,
                       place: Callable,
                       save_checkpoint: Callable[[Any, jax.Array, int],
                                                 None],
                       save_every: int, log_every: int,
                       train_step_late: Callable = None,
                       late_from_epoch: int = None,
                       ) -> Tuple[Any, Dict[str, List[float]]]:
    """Run the shared loop.

    train_step(state, *placed_fields, rng) -> (state, {"loss": ...});
    eval_step(state, *placed_fields) -> (loss, acc, pred);
    save_checkpoint(state, rng, epoch_1based, tag=None) writes one
    checkpoint (tag="best" names the keep_best snapshot file).
    Losses stay on device between log points (a float() per step would
    host-sync every step — benchmarks/README.md's 12x methodology row).

    train_step_late (optional): a second jitted step over the same
    state/fields used from epoch `late_from_epoch` on — the
    feedback-matched finetune phase (config.feedback_finetune_epochs).
    Two separate compiled programs, not a lax.cond: the phase boundary
    is a host-side epoch index, so neither program pays for the other's
    branch.
    """
    seed = max(config.random_seed, 0)
    n, bs = data[fields[0]].shape[0], config.batch_size
    require_full_batch(n, bs, config.name)
    history: Dict[str, List[float]] = {"train_loss": [], "val_loss": [],
                                       "val_acc": []}
    meter = AverageMeter("loss", ":.4f")
    # keep_best (beyond reference, opt-in): snapshot the best-val-loss
    # state to host (the live state's buffers are donated every step,
    # so a reference alone would read freed memory) and return/save it
    # instead of the final epoch's. The reference keeps fixed-cadence
    # checkpoints only and its Part d overfits well before the end of
    # its schedule (QUALITY.md loss curves).
    keep_best = bool(getattr(config, "keep_best", False))
    best_loss, best_snapshot, best_epoch = float("inf"), None, -1

    for epoch in range(start_epoch, config.epochs):
        step_fn = train_step
        if train_step_late is not None and epoch >= late_from_epoch:
            if epoch == late_from_epoch:
                logging.info("EP %d: switching to the feedback-matched "
                             "finetune step", epoch)
            step_fn = train_step_late
        perm = np.random.default_rng(seed + epoch).permutation(n)
        meter.reset()
        t0 = time.time()
        losses = []
        for b in range(max(n // bs, 1)):
            take = perm[b * bs:(b + 1) * bs]
            if take.size < bs:
                break
            rng, srng = jax.random.split(rng)
            state, metrics = step_fn(
                state, *(place(data[f][take]) for f in fields), srng)
            losses.append(metrics["loss"])
            if (b + 1) % log_every == 0:
                block = float(jnp.mean(jnp.stack(losses[-log_every:])))
                meter.update(block, bs * log_every)
                sps = (b + 1) * bs / (time.time() - t0)
                logging.info("EP %d (%d) %s, %.0f samples/s", epoch,
                             b + 1, meter, sps)
        # single batched device fetch for the epoch mean
        epoch_loss = (float(jnp.mean(jnp.stack(losses)))
                      if losses else float("nan"))
        meter.avg = epoch_loss
        history["train_loss"].append(epoch_loss)

        vl, va = [], []
        m = val_data[fields[0]].shape[0]
        for s in range(0, m - bs + 1, bs):
            loss, acc, _ = eval_step(
                state, *(place(val_data[f][s:s + bs]) for f in fields))
            vl.append(float(loss))
            va.append(float(acc))
        history["val_loss"].append(float(np.mean(vl)) if vl
                                   else float("nan"))
        history["val_acc"].append(float(np.mean(va)) if va
                                  else float("nan"))
        logging.info("EP %d done: train %.4f val %.4f acc %.3f", epoch,
                     meter.avg, history["val_loss"][-1],
                     history["val_acc"][-1])
        vloss = history["val_loss"][-1]
        if keep_best and vloss == vloss and vloss < best_loss:
            best_loss, best_epoch = vloss, epoch
            best_snapshot = jax.device_get(state)

        if (epoch + 1) % save_every == 0 or epoch + 1 == config.epochs:
            save_checkpoint(state, rng, epoch + 1)

    if keep_best and best_snapshot is not None:
        history["best_epoch"] = [best_epoch]
        history["best_val_loss"] = [best_loss]
        # Save under the distinct "best" tag (not a numbered epoch):
        # reuse paths pick checkpoints.latest_checkpoint, which prefers
        # this file — a numbered best-epoch file would sort below the
        # final epoch's and silently lose (round-4 advisor finding).
        save_checkpoint(best_snapshot, rng, best_epoch + 1, tag="best")
        logging.info("keep_best: returning epoch %d (val %.4f) instead "
                     "of the final epoch", best_epoch, best_loss)
        return best_snapshot, history
    return state, history

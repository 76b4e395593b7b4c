"""Audio-context Part-d trainer: mel chunks -> gesture tokens.

The reference's audio_context=True configuration trains through the
same train_text2embedding.py loop with EncoderRNN_With_Audio swapped in
(ref: scripts/model/text2embedding_model.py:41,563-571 +
Helper_models.py:179-317) and saves under the 'text2embedding' registry
kind. Here the audio variant is a first-class part with its own
checkpoint kind ("audio2token") so loads cannot silently cross wires
with the text model. Loss is the same CE over token positions 1..
(ref: train_eval/train_seq2seq.py:462-538). Honors config.mesh_shape:
batches dp-sharded, params replicated.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gesture2vec_tpu.models.gru import set_scan_unroll
from gesture2vec_tpu.models.audio2token import Audio2Token
from gesture2vec_tpu.train import checkpoints
from gesture2vec_tpu.train.config import Config
from gesture2vec_tpu.train.losses import token_cross_entropy
from gesture2vec_tpu.train.optim import make_optimizer
from gesture2vec_tpu.train.token_loop import run_token_training


class A2TTrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jnp.ndarray


def make_audio2token(config: Config) -> Audio2Token:
    set_scan_unroll(config.scan_unroll)
    n_steps = config.sentence_frame_length // config.n_poses
    return Audio2Token(n_tokens=config.autoencoder_vq_components,
                       hidden_size=config.hidden_size,
                       n_layers=config.n_layers,
                       n_steps=n_steps,
                       n_pre_poses=config.n_pre_poses,
                       dropout=config.dropout_prob,
                       use_attention=config.autoencoder_att)


def init_state(model: Audio2Token, rng: jax.Array,
               optimizer: optax.GradientTransformation,
               mel_shape: Tuple[int, int, int]) -> A2TTrainState:
    """mel_shape: (seconds, n_mels, frames) of one window."""
    mel = jnp.zeros((2,) + tuple(mel_shape), jnp.float32)
    tgt = jnp.zeros((2, model.n_steps), jnp.int32)
    variables = model.init({"params": rng,
                            "dropout": jax.random.fold_in(rng, 1)},
                           mel, tgt, train=False)
    return A2TTrainState(params=variables["params"],
                         opt_state=optimizer.init(variables["params"]),
                         batch_stats=variables.get("batch_stats", {}),
                         step=jnp.zeros((), jnp.int32))


def make_train_step(model: Audio2Token,
                    optimizer: optax.GradientTransformation):
    def step(state: A2TTrainState, mel, targets, rng: jax.Array):
        def loss_fn(params):
            res, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                mel, targets, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            loss = token_cross_entropy(res["logits"], targets)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (A2TTrainState(new_params, new_opt, new_bs, state.step + 1),
                {"loss": loss})

    return jax.jit(step, donate_argnums=0)


def make_eval_step(model: Audio2Token):
    def step(state: A2TTrainState, mel, targets):
        res = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            mel, targets, train=False)
        loss = token_cross_entropy(res["logits"], targets)
        pred = jnp.argmax(res["logits"], axis=-1)
        acc = jnp.mean((pred[:, 1:] == targets[:, 1:]).astype(jnp.float32))
        return loss, acc, pred

    return jax.jit(step)


def train_audio2token(config: Config, data: Dict[str, np.ndarray],
                      val_data: Dict[str, np.ndarray],
                      save_dir=None, save_every: int = 20,
                      log_every: int = 50,
                      resume_from: Optional[str] = None
                      ) -> Tuple[A2TTrainState, Dict[str, list]]:
    """data: {mel (N, S, n_mels, frames), tokens (N, n_steps)}."""
    seed = max(config.random_seed, 0)
    rng = jax.random.PRNGKey(seed)
    model = make_audio2token(config)
    optimizer = make_optimizer(config.learning_rate)
    state = init_state(model, rng, optimizer, data["mel"].shape[1:])
    start_epoch = 0
    if resume_from:
        state, rng, start_epoch, _ = checkpoints.restore_for_resume(
            state, rng, resume_from)
    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    mesh, state = prepare_state(state, config.mesh_shape)
    place = batch_placer(mesh)
    if mesh is not None:
        logging.info("training over mesh %s", config.mesh_shape)
    train_step = make_train_step(model, optimizer)
    eval_step = make_eval_step(model)

    def save(st, save_rng, epoch1):
        if not save_dir:
            return
        path = checkpoints.checkpoint_filename(save_dir, config.name,
                                               epoch1)
        checkpoints.save_checkpoint(
            path, config=config, epoch=epoch1, params=st.params,
            pose_dim=config.autoencoder_vq_components,
            extra={"batch_stats": st.batch_stats,
                   "mel_shape": list(data["mel"].shape[1:]),
                   **checkpoints.resume_extra(st, save_rng, config)},
            kind="audio2token")
        logging.info("saved checkpoint %s", path)

    return run_token_training(
        config, state, rng, start_epoch, ("mel", "tokens"), data,
        val_data, train_step, eval_step, place, save, save_every,
        log_every)


@checkpoints.register_model_kind("audio2token")
def _build_a2t(config: Config, payload: dict):
    model = make_audio2token(config)
    variables = {"params": payload["params"],
                 "batch_stats": payload["extra"].get("batch_stats", {})}
    return model, variables

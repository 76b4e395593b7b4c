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


def make_audio2token(config: Config, n_words: int = 0) -> Audio2Token:
    """n_words is required (vocab size) when config.audio_fusion is
    "both" (text+audio fusion, ref Helper_models.py both=True)."""
    set_scan_unroll(config.scan_unroll)
    n_steps = config.sentence_frame_length // config.n_poses
    if config.audio_fusion == "both" and n_words <= 0:
        raise ValueError("audio_fusion='both' needs n_words > 0")
    return Audio2Token(n_tokens=config.autoencoder_vq_components,
                       hidden_size=config.hidden_size,
                       n_layers=config.n_layers,
                       n_steps=n_steps,
                       n_pre_poses=config.n_pre_poses,
                       dropout=config.dropout_prob,
                       use_attention=config.autoencoder_att,
                       fusion=config.audio_fusion,
                       n_words=n_words,
                       embed_size=config.wordembed_dim,
                       token_stages=config.token_stages,
                       stage_conditional=config.stage_conditional,
                       compute_dtype=config.compute_dtype)


def _example_inputs(model: Audio2Token, audio_shape, max_words: int = 8):
    """Dummy encoder inputs for init: audio_shape is (seconds, n_mels,
    frames) for fusion="audio", (chunks, samples) for "both"."""
    if model.fusion == "both":
        return (jnp.zeros((2, max_words), jnp.int32),
                jnp.zeros((2,) + tuple(audio_shape), jnp.float32))
    return jnp.zeros((2,) + tuple(audio_shape), jnp.float32)


def init_state(model: Audio2Token, rng: jax.Array,
               optimizer: optax.GradientTransformation,
               mel_shape: Tuple[int, ...],
               max_words: int = 8) -> A2TTrainState:
    """mel_shape: (seconds, n_mels, frames) of one window, or
    (chunks, samples) raw-wave shape when model.fusion == "both"."""
    enc_in = _example_inputs(model, mel_shape, max_words)
    tgt = jnp.zeros((2, model.n_steps), jnp.int32)
    variables = model.init({"params": rng,
                            "dropout": jax.random.fold_in(rng, 1)},
                           enc_in, tgt, train=False)
    return A2TTrainState(params=variables["params"],
                         opt_state=optimizer.init(variables["params"]),
                         batch_stats=variables.get("batch_stats", {}),
                         step=jnp.zeros((), jnp.int32))


def make_train_step(model: Audio2Token,
                    optimizer: optax.GradientTransformation,
                    label_smoothing: float = 0.0):
    multi = model.token_stages > 1
    cond = multi and getattr(model, "stage_conditional", False)

    def step(state: A2TTrainState, *args):
        # args = (*encoder_inputs, targets[, stage_targets], rng): one
        # encoder input (mel) for fusion="audio", two (word_ids, wav)
        # for "both"; stage_targets only when token_stages > 1
        if multi:
            *enc_in, targets, stage, rng = args
        else:
            *enc_in, targets, rng = args
        enc_in = enc_in[0] if len(enc_in) == 1 else tuple(enc_in)

        def loss_fn(params):
            kw = {"stage_targets": stage} if cond else {}
            res, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                enc_in, targets, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"], **kw)
            loss = token_cross_entropy(res["logits"], targets,
                                       label_smoothing=label_smoothing)
            if multi:
                from gesture2vec_tpu.train.text2token_trainer import \
                    _stage_ce
                loss = loss + _stage_ce(res, stage)
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
    multi = model.token_stages > 1

    def step(state: A2TTrainState, *args):
        if multi:
            *enc_in, targets, stage = args
        else:
            *enc_in, targets = args
        enc_in = enc_in[0] if len(enc_in) == 1 else tuple(enc_in)
        res = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            enc_in, targets, train=False)
        loss = token_cross_entropy(res["logits"], targets)
        if multi:
            from gesture2vec_tpu.train.text2token_trainer import _stage_ce
            loss = loss + _stage_ce(res, stage)
        pred = jnp.argmax(res["logits"], axis=-1)
        acc = jnp.mean((pred[:, 1:] == targets[:, 1:]).astype(jnp.float32))
        return loss, acc, pred

    return jax.jit(step)


def train_audio2token(config: Config, data: Dict[str, np.ndarray],
                      val_data: Dict[str, np.ndarray],
                      save_dir=None, save_every: int = 20,
                      log_every: int = 50,
                      resume_from: Optional[str] = None,
                      n_words: int = 0,
                      lang_model_state: Optional[dict] = None
                      ) -> Tuple[A2TTrainState, Dict[str, list]]:
    """data: {mel (N, S, n_mels, frames), tokens (N, n_steps)} for
    audio_fusion="audio"; {word_ids (N, T), wav (N, S, samples),
    tokens} plus n_words (and optionally lang_model_state, the vocab
    saved into checkpoints for inference) for audio_fusion="both"."""
    seed = max(config.random_seed, 0)
    rng = jax.random.PRNGKey(seed)
    model = make_audio2token(config, n_words=n_words)
    optimizer = make_optimizer(config.learning_rate)
    both = model.fusion == "both"
    audio_key = "wav" if both else "mel"
    state = init_state(model, rng, optimizer, data[audio_key].shape[1:],
                       max_words=(data["word_ids"].shape[1] if both
                                  else 8))
    start_epoch = 0
    if resume_from:
        state, rng, start_epoch, _ = checkpoints.restore_for_resume(
            state, rng, resume_from)
    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    mesh, state = prepare_state(state, config.mesh_shape)
    place = batch_placer(mesh)
    if mesh is not None:
        logging.info("training over mesh %s", config.mesh_shape)
    train_step = make_train_step(model, optimizer,
                                 label_smoothing=config.label_smoothing)
    eval_step = make_eval_step(model)

    def save(st, save_rng, epoch1, tag=None):
        if not save_dir:
            return
        path = checkpoints.checkpoint_filename(save_dir, config.name,
                                               tag if tag else epoch1)
        checkpoints.save_checkpoint(
            path, config=config, epoch=epoch1, params=st.params,
            pose_dim=config.autoencoder_vq_components,
            lang_model=lang_model_state,
            extra={"batch_stats": st.batch_stats,
                   "mel_shape": list(data[audio_key].shape[1:]),
                   "n_words": n_words,
                   **checkpoints.resume_extra(st, save_rng, config)},
            kind="audio2token")
        logging.info("saved checkpoint %s", path)

    fields = (("word_ids", "wav", "tokens") if both
              else ("mel", "tokens"))
    if config.token_stages > 1:
        assert "stage_tokens" in data, \
            "token_stages > 1 needs stage_tokens in the dataset " \
            "(build_sentence_dataset emit_stage_tokens=True over an " \
            "rvq Part-b teacher)"
        fields = fields + ("stage_tokens",)
    return run_token_training(
        config, state, rng, start_epoch, fields, data,
        val_data, train_step, eval_step, place, save, save_every,
        log_every)


@checkpoints.register_model_kind("audio2token")
def _build_a2t(config: Config, payload: dict):
    # inference loads force fp32 (token identity; same policy as the
    # text2embedding builder)
    config = config.replace(compute_dtype="float32")
    model = make_audio2token(
        config, n_words=int(payload["extra"].get("n_words", 0)))
    variables = {"params": payload["params"],
                 "batch_stats": payload["extra"].get("batch_stats", {})}
    return model, variables

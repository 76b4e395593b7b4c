"""Part d trainer: text -> gesture-token translation.

Rebuild of scripts/train_text2embedding.py (ref: :71-421) with the
training math of train_iter_text2embedding
(ref: scripts/train_eval/train_seq2seq.py:462-538): cross-entropy over
token positions 1.. (position 0 is the seed one-hot). Evaluation also
reports the token-histogram perplexity the reference logs
(ref: train_text2embedding.py:371-410).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gesture2vec_tpu.models.gru import set_scan_unroll
from gesture2vec_tpu.models.text2token import Text2Token
from gesture2vec_tpu.train import checkpoints
from gesture2vec_tpu.train.config import Config
from gesture2vec_tpu.train.losses import token_cross_entropy
from gesture2vec_tpu.train.optim import make_optimizer
from gesture2vec_tpu.train.token_loop import run_token_training


class T2TTrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jnp.ndarray


def make_text2token(config: Config, n_words: int,
                    embedding_weights: Optional[np.ndarray] = None
                    ) -> Text2Token:
    """pose_dim := vq components when discrete
    (ref: text2embedding_model.py:543-544).

    `t2t_arch: transformer` in the YAML selects the beyond-reference
    parallel transformer variant (models/transformer) - identical API,
    trained/checkpointed/served through the same code paths."""
    set_scan_unroll(config.scan_unroll)
    n_steps = config.sentence_frame_length // config.n_poses
    if config.extras.get("t2t_arch", "gru") == "transformer":
        from gesture2vec_tpu.models.transformer import (
            TransformerText2Token)
        return TransformerText2Token(
            n_words=n_words,
            n_tokens=config.autoencoder_vq_components,
            hidden_size=config.hidden_size,
            n_layers=config.n_layers,
            n_steps=n_steps,
            n_pre_poses=config.n_pre_poses,
            dropout=config.dropout_prob,
            word_embed_size=config.wordembed_dim,
            n_heads=int(config.extras.get("t2t_heads", 4)),
            embedding_weights=embedding_weights,
            token_stages=config.token_stages,
            stage_conditional=config.stage_conditional,
            compute_dtype=config.compute_dtype)
    return Text2Token(
        n_words=n_words,
        n_tokens=config.autoencoder_vq_components,
        hidden_size=config.hidden_size,
        n_layers=config.n_layers,
        n_steps=n_steps,
        n_pre_poses=config.n_pre_poses,
        dropout=config.dropout_prob,
        word_embed_size=config.wordembed_dim,
        encoder_type=config.extras.get("text_encoder", "tcn"),
        use_attention=config.autoencoder_att,
        embedding_weights=embedding_weights,
        token_stages=config.token_stages,
        stage_conditional=config.stage_conditional,
        compute_dtype=config.compute_dtype)


def init_state(model: Text2Token, rng: jax.Array,
               optimizer: optax.GradientTransformation,
               max_words: int = 48) -> T2TTrainState:
    toks = jnp.zeros((2, max_words), jnp.int32)
    lens = jnp.full((2,), max_words, jnp.int32)
    tgt = jnp.zeros((2, model.n_steps), jnp.int32)
    variables = model.init({"params": rng,
                            "dropout": jax.random.fold_in(rng, 1)},
                           toks, lens, tgt, train=False)
    return T2TTrainState(params=variables["params"],
                         opt_state=optimizer.init(variables["params"]),
                         batch_stats=variables.get("batch_stats", {}),
                         step=jnp.zeros((), jnp.int32))


def _stage_ce(res: Dict[str, Any], stage_targets) -> jnp.ndarray:
    """Sum of the residual-stage heads' CE: head s predicts stage s+1's
    code at steps 1.. (stage_targets (B, T, S); column 0 is the primary
    token, already covered by the stage-0 CE)."""
    sl = res["stage_logits"]                       # (B, T-1, S-1, K)
    loss = jnp.zeros(())
    for s in range(sl.shape[2]):
        loss = loss + token_cross_entropy(
            sl[:, :, s], stage_targets[:, 1:, s + 1], ignore_first=False)
    return loss


def make_train_step(model: Text2Token,
                    optimizer: optax.GradientTransformation,
                    label_smoothing: float = 0.0):
    multi = model.token_stages > 1
    cond = multi and getattr(model, "stage_conditional", False)

    def step(state: T2TTrainState, word_ids, lengths, targets,
             *rest):
        *stage, rng = rest

        def loss_fn(params):
            kw = {"stage_targets": stage[0]} if cond else {}
            res, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                word_ids, lengths, targets, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"], **kw)
            loss = token_cross_entropy(res["logits"], targets,
                                       label_smoothing=label_smoothing)
            if multi:
                loss = loss + _stage_ce(res, stage[0])
            # transformer arch has no BatchNorm -> no batch_stats
            return loss, mut.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (T2TTrainState(new_params, new_opt, new_bs,
                              state.step + 1),
                {"loss": loss})

    return jax.jit(step, donate_argnums=0)


def make_feedback_train_step(model: Text2Token,
                             optimizer: optax.GradientTransformation,
                             label_smoothing: float = 0.0,
                             feedback_temperature: float = 0.0):
    """Feedback-matched finetune step (config.feedback_finetune_epochs;
    beyond reference for the transformer arch, reference-semantics for
    the GRU): the forward pass is the DECODE-TIME rollout — the model's
    own argmax (or sampled, feedback_temperature > 0) token feeds back
    after n_pre_poses and the stage-conditional chain conditions on its
    own choices — with CE against the ground-truth codes. This trains
    the distribution the free-running decode actually samples from,
    closing the teacher-forced-train / free-running-eval mismatch the
    round-4 temperature sweep isolated. The reference GRU itself trains
    on argmax feedback (ref text2embedding_model.py:734-744); its
    teacher signal only ever covers the pre-poses.

    The rollout runs train=False (no dropout, BatchNorm stats frozen):
    a finetune phase matching the inference-time activation statistics
    is the point. Gradients flow through the per-step logits; the
    integer token feedback is non-differentiable pass-through, same as
    the reference's detached argmax feed."""
    multi = model.token_stages > 1

    def step(state: T2TTrainState, word_ids, lengths, targets,
             *rest):
        *stage, rng = rest

        def loss_fn(params):
            kw, rngs = {}, {}
            if feedback_temperature > 0.0:
                kw = dict(temperature=feedback_temperature)
                rngs["sample"] = jax.random.fold_in(rng, 7)
            res = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                word_ids, lengths, targets, train=False,
                rngs=rngs, **kw)
            loss = token_cross_entropy(res["logits"], targets,
                                       label_smoothing=label_smoothing)
            if multi:
                loss = loss + _stage_ce(res, stage[0])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (T2TTrainState(new_params, new_opt, state.batch_stats,
                              state.step + 1),
                {"loss": loss})

    return jax.jit(step, donate_argnums=0)


def make_eval_step(model: Text2Token):
    multi = model.token_stages > 1

    def step(state: T2TTrainState, word_ids, lengths, targets, *stage):
        res = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            word_ids, lengths, targets, train=False)
        loss = token_cross_entropy(res["logits"], targets)
        if multi:
            loss = loss + _stage_ce(res, stage[0])
        # acc is stage-0 (THE pipeline token) for comparability
        pred = jnp.argmax(res["logits"], axis=-1)
        acc = jnp.mean((pred[:, 1:] == targets[:, 1:]).astype(jnp.float32))
        return loss, acc, pred

    return jax.jit(step)


def token_histogram_perplexity(tokens: np.ndarray, n_classes: int) -> float:
    """exp(entropy) of the empirical token histogram - the reference's
    'perplexity' eval metric (ref: train_text2embedding.py:371-410,
    hardcoded 514 classes there; parameterized here)."""
    hist = np.bincount(tokens.reshape(-1), minlength=n_classes).astype(
        np.float64)
    p = hist / max(hist.sum(), 1)
    ent = -(p[p > 0] * np.log(p[p > 0])).sum()
    return float(np.exp(ent))


def train_text2token(config: Config, data: Dict[str, np.ndarray],
                     val_data: Dict[str, np.ndarray], n_words: int,
                     embedding_weights: Optional[np.ndarray] = None,
                     lang_model_state: Optional[dict] = None,
                     save_dir: Optional[str] = None, save_every: int = 20,
                     log_every: int = 50,
                     resume_from: Optional[str] = None
                     ) -> Tuple[T2TTrainState, Dict[str, list]]:
    """resume_from mirrors the reference's Part-d checkpoint resume
    (ref: train_text2embedding.py:166-177), extended to bit-exact
    optimizer/PRNG restoration when the checkpoint carries them."""
    seed = max(config.random_seed, 0)
    rng = jax.random.PRNGKey(seed)
    model = make_text2token(config, n_words, embedding_weights)
    optimizer = make_optimizer(config.learning_rate)
    state = init_state(model, rng, optimizer,
                       max_words=data["word_ids"].shape[1])
    start_epoch = 0
    if resume_from:
        state, rng, start_epoch, _ = checkpoints.restore_for_resume(
            state, rng, resume_from)
    # multi-chip: batch over dp; the vocab embedding table row-shards
    # over tp via parallel.mesh.param_spec (SURVEY.md §2.8)
    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    mesh, state = prepare_state(state, config.mesh_shape)
    place = batch_placer(mesh)
    if mesh is not None:
        logging.info("training over mesh %s", config.mesh_shape)
    train_step = make_train_step(model, optimizer,
                                 label_smoothing=config.label_smoothing)
    eval_step = make_eval_step(model)
    step_late, late_from = None, None
    if config.feedback_finetune_epochs > 0:
        late_from = max(0, config.epochs - config.feedback_finetune_epochs)
        step_late = make_feedback_train_step(
            model, optimizer, label_smoothing=config.label_smoothing,
            feedback_temperature=config.feedback_temperature)

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
                   "n_words": n_words,
                   **checkpoints.resume_extra(st, save_rng, config)},
            kind="text2embedding")
        logging.info("saved checkpoint %s", path)

    fields = ("word_ids", "lengths", "tokens")
    if config.token_stages > 1:
        assert "stage_tokens" in data, \
            "token_stages > 1 needs stage_tokens in the dataset " \
            "(build_sentence_dataset emit_stage_tokens=True over an " \
            "rvq Part-b teacher)"
        fields = fields + ("stage_tokens",)
    return run_token_training(
        config, state, rng, start_epoch,
        fields, data, val_data,
        train_step, eval_step, place, save, save_every, log_every,
        train_step_late=step_late, late_from_epoch=late_from)


@checkpoints.register_model_kind("text2embedding")
def _build_t2t(config: Config, payload: dict):
    # inference/analysis loads force fp32 compute regardless of the
    # training dtype: tokens must be fp32-exact, and bf16 measured
    # slower at inference (same policy as the autoencoder_vq builder)
    config = config.replace(compute_dtype="float32")
    n_words = int(payload["extra"]["n_words"])
    model = make_text2token(config, n_words)
    variables = {"params": payload["params"],
                 "batch_stats": payload["extra"].get("batch_stats", {})}
    return model, variables

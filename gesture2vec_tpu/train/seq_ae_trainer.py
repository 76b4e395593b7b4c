"""Part b trainer: the gesture tokenizer (sequence VQ autoencoder).

Rebuild of scripts/train_autoencoder_VQVAE.py (ref: :81-445) with the
training math of train_iter_Autoencoder_VQ_seq2seq
(ref: scripts/train_eval/train_seq2seq.py:664-758):
  loss = custom_loss(outputs, target) + loss_vq / 400 (+ annealed KLD).
This is the flagship TPU training step: batch sharded over the "dp" mesh
axis, parameters replicated, gradients psum'd by jit's partitioner.
"""
from __future__ import annotations

import logging
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gesture2vec_tpu.models.gru import set_scan_unroll
from gesture2vec_tpu.models.seq_ae import SeqVQAutoencoder
from gesture2vec_tpu.train import checkpoints
from gesture2vec_tpu.train.config import Config
from gesture2vec_tpu.train.losses import (custom_loss, kld_loss,
                                          kld_loss_standard)
from gesture2vec_tpu.train.optim import make_optimizer
from gesture2vec_tpu.train.token_loop import require_full_batch
from gesture2vec_tpu.utils.meters import AverageMeter


class SeqAETrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jnp.ndarray


def make_seq_ae(config: Config, parity: bool = False) -> SeqVQAutoencoder:
    """Model construction mirroring the reference init
    (ref: train_autoencoder_VQVAE.py:81-106 + model __init__)."""
    set_scan_unroll(config.scan_unroll)
    rep_dim = config.rep_learning_dim
    if config.use_derivative:
        rep_dim *= 2  # ref: train_autoencoder_VQVAE.py:740-741
    return SeqVQAutoencoder(
        rep_dim=rep_dim,
        hidden_size=config.hidden_size,
        n_layers=config.n_layers,
        n_frames=config.n_poses,
        n_pre_poses=config.n_pre_poses,
        dropout=config.dropout_prob,
        use_vq=config.autoencoder_vq,
        vq_components=config.autoencoder_vq_components,
        commitment_cost=config.autoencoder_vq_commitment_cost,
        use_vae=config.autoencoder_vae,
        use_attention=config.autoencoder_att,
        conditioned=config.autoencoder_conditioned,
        vq_variant=config.autoencoder_vq_variant,
        rvq_stages=config.rvq_stages,
        vq_flatten="torch_view" if parity else "per_sample",
        eval_step_dropout=config.eval_dropout_quirk and parity,
        compute_dtype=config.compute_dtype,
        # `seq_arch: transformer` selects the TPU-first parallel chunk
        # encoder (models/seq_encoder); decoder/VQ identical either way
        encoder_arch=config.extras.get("seq_arch", "bigru"),
    )


def init_state(config: Config, model: SeqVQAutoencoder, rng: jax.Array,
               optimizer: optax.GradientTransformation) -> SeqAETrainState:
    dummy = jnp.zeros((2, model.n_frames, model.rep_dim), jnp.float32)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1),
         "reparam": jax.random.fold_in(rng, 2)},
        dummy, dummy, train=False)
    return SeqAETrainState(params=variables["params"],
                           opt_state=optimizer.init(variables["params"]),
                           batch_stats=variables.get("batch_stats", {}),
                           step=jnp.zeros((), jnp.int32))


def make_train_step(config: Config, model: SeqVQAutoencoder,
                    optimizer: optax.GradientTransformation,
                    total_epochs: int):
    def step(state: SeqAETrainState, batch: jnp.ndarray, rng: jax.Array,
             epoch: jnp.ndarray):
        rngs = {"dropout": rng, "reparam": jax.random.fold_in(rng, 7)}

        def loss_fn(params):
            res, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, batch, train=True, rngs=rngs,
                mutable=["batch_stats"])
            rec = custom_loss(res["outputs"], batch,
                              l1_weight=config.loss_l1_weight,
                              cont_weight=config.loss_cont_weight,
                              var_weight=config.loss_var_weight)
            loss = rec
            if model.use_vae:
                # annealed standard KLD (ref: train_seq2seq.py:712-729,
                # kl_start_epoch=0 with a 1-INDEXED epoch loop: its
                # first epoch already applies weight 0.1*1/N, so our
                # 0-indexed epoch shifts by one to match the schedule)
                kld = kld_loss_standard(res["mean"], res["logvar"])
                loss = loss + kld * 0.1 * (epoch + 1.0) / total_epochs
            if model.use_vq:
                # vq term scaled by 1/400, applied every epoch: the
                # reference's epoch loop is 1-indexed
                # (train_autoencoder_VQVAE.py:163,212) so its
                # `if epoch > vq_start_epoch(0)` gate
                # (train_seq2seq.py:734-738) is always true.
                # Quantization itself is likewise not gated: the forward
                # hardcodes vq_layer_active=True (model :974-975).
                loss = loss + res["vq"].loss / 400.0
            perp = (res["vq"].perplexity if model.use_vq
                    else jnp.zeros(()))
            return loss, {"perplexity": perp,
                          "batch_stats": mut["batch_stats"]}

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = SeqAETrainState(params=new_params, opt_state=new_opt,
                                    batch_stats=aux["batch_stats"],
                                    step=state.step + 1)
        return new_state, {"loss": loss, "perplexity": aux["perplexity"]}

    return jax.jit(step, donate_argnums=0)


def make_ssl_train_step(config: Config, model: SeqVQAutoencoder,
                        optimizer: optax.GradientTransformation,
                        total_epochs: int):
    """Semi-supervised Part-b step with the pairwise similarity loss
    (ref: train_eval/train_seq2seq.py:311-412
    train_iter_Autoencoder_ssl_seq2seq): cosine similarity between the
    sequence latents of labeled window pairs, sign-flipped for
    similar-labeled pairs.

    Repaired on purpose: the reference sums `loss_label_weight +
    loss_unlabeled` - adding the scalar WEIGHT, so its labeled loss is a
    no-op (ref :396). Here the labeled term actually contributes:
    loss = unlabeled + loss_label_weight * sum(+-cos), with the pair
    latents taken exactly where the reference's forward returns them -
    the POST-VQ / post-VAE decoder first hidden of a full train-mode
    pass over each pair member (ref :366-378: `_, latents_pN = net(
    stack_pairsN, stack_pairsN)` returns decoder_first_hidden,
    Autoencoder_VQVAE_model.py:1055-1085), so similarity supervision
    reaches the quantizer/codebook, not just the raw encoder.
    """

    def pair_latents(params, batch_stats, windows, rngs):
        res, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            windows, windows, train=True, rngs=rngs,
            mutable=["batch_stats"])
        h = res["first_hidden"]
        L, B, H = h.shape
        # hstack of the layer hiddens per batch row (ref :374-378)
        return (jnp.transpose(h, (1, 0, 2)).reshape(B, L * H),
                mut["batch_stats"])

    def step(state: SeqAETrainState, batch: jnp.ndarray,
             pair_a: jnp.ndarray, pair_b: jnp.ndarray,
             pair_label: jnp.ndarray, rng: jax.Array, epoch: jnp.ndarray):
        rngs = {"dropout": rng, "reparam": jax.random.fold_in(rng, 7)}

        def loss_fn(params):
            res, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, batch, train=True, rngs=rngs,
                mutable=["batch_stats"])
            rec = custom_loss(res["outputs"], batch,
                              l1_weight=config.loss_l1_weight,
                              cont_weight=config.loss_cont_weight,
                              var_weight=config.loss_var_weight)
            # pair forwards run in train mode with fresh dropout streams,
            # threading batch stats in the reference's call order
            # (main batch -> pairs1 -> pairs2, ref :352-370)
            rngs_a = {"dropout": jax.random.fold_in(rng, 11),
                      "reparam": jax.random.fold_in(rng, 12)}
            rngs_b = {"dropout": jax.random.fold_in(rng, 13),
                      "reparam": jax.random.fold_in(rng, 14)}
            la, bs1 = pair_latents(params, mut["batch_stats"], pair_a,
                                   rngs_a)
            lb, bs2 = pair_latents(params, bs1, pair_b, rngs_b)
            cos = jnp.sum(la * lb, axis=-1) / (
                jnp.linalg.norm(la, axis=-1) *
                jnp.linalg.norm(lb, axis=-1) + 1e-8)
            # similar pairs (label 1): maximize cos; dissimilar: minimize
            # (sum over pairs, not mean: ref :395 torch.sum)
            signed = jnp.where(pair_label > 0.5, -cos, cos)
            sim_loss = jnp.sum(signed)
            loss = rec + config.loss_label_weight * sim_loss
            if model.use_vae:
                # annealed KLD from the reference's 11th epoch: its loop
                # is 1-indexed and gates `epoch > kl_start_epoch(10)`
                # with weight 0.1*(epoch-10)/N (ref:
                # train_seq2seq.py:399-402). Our epochs are 0-indexed, so
                # shift by one to keep the same schedule. The SSL branch
                # uses the reference's FIRST KLD formula (ref :352-356;
                # the overwriting :715-716 variant belongs to the
                # non-SSL trainer only).
                kld = kld_loss(res["mean"], res["logvar"])
                loss = loss + jnp.where(
                    (epoch + 1.0) > 10.0,
                    kld * 0.1 * (epoch + 1.0 - 10.0) / total_epochs, 0.0)
            perp = jnp.zeros(())
            if model.use_vq:
                loss = loss + res["vq"].loss / 400.0
                perp = res["vq"].perplexity
            return loss, {"rec": rec, "sim": sim_loss, "perplexity": perp,
                          "batch_stats": bs2}

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = SeqAETrainState(params=new_params, opt_state=new_opt,
                                    batch_stats=aux["batch_stats"],
                                    step=state.step + 1)
        return new_state, {"loss": loss, "rec": aux["rec"],
                           "sim": aux["sim"],
                           "perplexity": aux["perplexity"]}

    return jax.jit(step, donate_argnums=0)


def make_eval_step(config: Config, model: SeqVQAutoencoder):
    def step(state: SeqAETrainState, batch: jnp.ndarray, rng: jax.Array):
        res = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, batch, train=False, rngs={"dropout": rng})
        return custom_loss(res["outputs"], batch,
                           l1_weight=config.loss_l1_weight,
                           cont_weight=config.loss_cont_weight,
                           var_weight=config.loss_var_weight)

    return jax.jit(step)


def reestimate_rvq_codebooks(model: SeqVQAutoencoder,
                             state: SeqAETrainState,
                             windows: np.ndarray, k: int, stages: int,
                             batch: int = 512,
                             max_rows: int = 20000) -> SeqAETrainState:
    """K-Means re-fit of every residual-VQ stage codebook over the
    current encoder latents: stage 0 fits the flattened decoder-initial
    hiddens, stage s fits the residual left by stages <s (mirrors the
    Part-a codebook trick, ref: train_DAE.py:241-263, applied per
    stage). Gradient training alone collapses hard-assign codebooks —
    dead codes never receive gradient — so the trainer calls this every
    `rvq_reestimate_every` epochs. Adam moments for the codebook rows
    are left untouched (they decay within a few steps)."""
    from gesture2vec_tpu.cluster.kmeans import kmeans_fit
    from gesture2vec_tpu.models.seq_ae import _flatten_hidden

    variables = {"params": state.params,
                 "batch_stats": state.batch_stats}

    @jax.jit
    def enc(x):
        _, dec_hidden = model.apply(variables, x, method=model.encode)
        return _flatten_hidden(dec_hidden, model.vq_flatten)

    sub = windows
    if windows.shape[0] > max_rows:
        pick = np.random.default_rng(0).permutation(
            windows.shape[0])[:max_rows]
        sub = windows[np.sort(pick)]
    rows = []
    for s in range(0, sub.shape[0] - batch + 1, batch):  # full batches
        rows.append(np.asarray(enc(jnp.asarray(sub[s:s + batch]))))
    if not rows:
        rows = [np.asarray(enc(jnp.asarray(sub)))]
    resid = np.concatenate(rows, axis=0).astype(np.float32)

    vq_params = dict(state.params["vq_layer"])
    for s in range(stages):
        name = "codebook" if s == 0 else f"codebook_r{s}"
        km = kmeans_fit(resid, k, key=jax.random.PRNGKey(s), n_init=1,
                        max_iter=100)
        centers = np.asarray(km.centers, np.float32)
        d = ((resid ** 2).sum(1, keepdims=True) + (centers ** 2).sum(1)
             - 2.0 * resid @ centers.T)
        resid = resid - centers[np.argmin(d, axis=1)]
        vq_params[name] = jnp.asarray(centers)
    logging.info("RVQ codebooks re-estimated from %d latents "
                 "(%d stages, k=%d)", resid.shape[0], stages, k)
    params = dict(state.params)
    params["vq_layer"] = vq_params
    return state._replace(params=params)


def train_seq_ae(config: Config, train_windows: np.ndarray,
                 val_windows: np.ndarray, save_dir: Optional[str] = None,
                 save_every: int = 20, log_every: int = 50,
                 parity: bool = False,
                 resume_from: Optional[str] = None,
                 plot_every: int = 0
                 ) -> Tuple[SeqAETrainState, Dict[str, list]]:
    """Full Part-b loop (ref: train_autoencoder_VQVAE.py:108-445).
    train_windows: (N, n_poses, rep_dim) frozen-DAE latents.
    resume_from restores params/batch_stats and continues from the
    stored epoch (ref: train_autoencoder_VQVAE.py:164-178)."""
    seed = max(config.random_seed, 0)
    rng = jax.random.PRNGKey(seed)
    model = make_seq_ae(config, parity=parity)
    optimizer = make_optimizer(config.learning_rate)
    state = init_state(config, model, rng, optimizer)
    start_epoch = 0
    if resume_from:
        state, rng, start_epoch, _ = checkpoints.restore_for_resume(
            state, rng, resume_from)

    # multi-chip: shard params (codebook rows over tp, rest replicated)
    # and batches (over dp); jit's partitioner inserts the collectives
    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    mesh, state = prepare_state(state, config.mesh_shape)
    place = batch_placer(mesh)
    if mesh is not None:
        logging.info("training over mesh %s", config.mesh_shape)
    # semi-supervised variant: human similarity labels drive a pairwise
    # cosine term on the sequence latents (ref: train_Autoencoder.py with
    # use_similarity + lmdb_data_loader.py:676-850). Pairs are sampled on
    # the host each step like the reference (3 per iteration, ref :732).
    # streaming source (data/streaming.StreamingWindows, optionally with
    # a frozen-DAE teacher transform) or in-RAM array
    streaming = hasattr(train_windows, "batches")
    ssl_pairs = None
    if streaming and config.use_similarity:
        raise ValueError("use_similarity needs the in-RAM window array "
                        "(pair sampling indexes it)")
    if config.use_similarity and config.similarity_labels:
        from gesture2vec_tpu.data.similarity import (read_gesture_labels,
                                                     sample_pairs)
        if mesh is not None:
            raise ValueError("use_similarity training is single-device "
                             "(the reference has no distributed variant); "
                             "unset mesh_shape")
        ssl_pairs = read_gesture_labels(config.similarity_labels)
        ssl_step = make_ssl_train_step(config, model, optimizer,
                                       config.epochs)
        logging.info("SSL mode: %d labeled pairs from %s",
                     len(ssl_pairs), config.similarity_labels)
    train_step = make_train_step(config, model, optimizer, config.epochs)
    eval_step = make_eval_step(config, model)

    n = len(train_windows) if streaming else train_windows.shape[0]
    bs = config.batch_size
    require_full_batch(n, bs, config.name)
    history: Dict[str, list] = {"train_loss": [], "val_loss": [],
                                "perplexity": []}
    meter = AverageMeter("loss", ":.4f")
    perp_m = AverageMeter("perplexity", ":.1f")

    rvq_every = (config.rvq_reestimate_every
                 if (config.autoencoder_vq
                     and config.autoencoder_vq_variant == "rvq"
                     and not streaming) else 0)
    for epoch in range(start_epoch, config.epochs):
        if rvq_every and epoch and epoch % rvq_every == 0:
            state = reestimate_rvq_codebooks(
                model, state, train_windows,
                config.autoencoder_vq_components, config.rvq_stages)
            if mesh is not None:
                # keep the rebuilt codebooks on the mesh layout (rows
                # are tp-sharded) so the compiled step is not retraced
                from gesture2vec_tpu.parallel.mesh import shard_params
                state = state._replace(
                    params=shard_params(state.params, mesh))
        meter.reset()
        perp_m.reset()
        t0 = time.time()
        from gesture2vec_tpu.utils.prefetch import prefetch
        if streaming:
            batches = prefetch(train_windows.batches(epoch, bs),
                               place=place)
        else:
            perm = np.random.default_rng(seed + epoch).permutation(n)
            batches = prefetch(
                (train_windows[perm[b * bs:(b + 1) * bs]]
                 for b in range(n // bs)), place=place)
        # losses/perplexities stay on device between log points (a
        # float() per step would host-sync every step)
        losses, perps = [], []
        for b, batch in enumerate(batches):
            rng, srng = jax.random.split(rng)
            if ssl_pairs is not None:
                pa, pb, pl = sample_pairs(
                    ssl_pairs, 3,
                    np.random.default_rng(seed + epoch * 65536 + b), n)
                state, metrics = ssl_step(
                    state, batch, jnp.asarray(train_windows[pa]),
                    jnp.asarray(train_windows[pb]), jnp.asarray(pl),
                    srng, jnp.asarray(epoch, jnp.float32))
            else:
                state, metrics = train_step(state, batch, srng,
                                            jnp.asarray(epoch,
                                                        jnp.float32))
            losses.append(metrics["loss"])
            perps.append(metrics["perplexity"])
            if (b + 1) % log_every == 0:
                # one sync fetches the whole block's exact mean
                block = float(jnp.mean(jnp.stack(losses[-log_every:])))
                pblock = float(jnp.mean(jnp.stack(perps[-log_every:])))
                meter.update(block, bs * log_every)
                perp_m.update(pblock, bs * log_every)
                sps = (b + 1) * bs / (time.time() - t0)
                logging.info("EP %d (%d/%d) %s %s, %.0f samples/s", epoch,
                             b + 1, n // bs, meter, perp_m, sps)
        # single batched device fetch (len(losses) float() calls would be
        # one tunnel round-trip each)
        epoch_loss = (float(jnp.mean(jnp.stack(losses)))
                      if losses else float("nan"))
        epoch_perp = (float(jnp.mean(jnp.stack(perps)))
                      if perps else float("nan"))
        meter.avg = epoch_loss
        perp_m.avg = epoch_perp
        history["train_loss"].append(epoch_loss)
        history["perplexity"].append(epoch_perp)

        val_losses = []
        rng, vrng = jax.random.split(rng)
        for s in range(0, val_windows.shape[0] - bs + 1, bs):
            val_losses.append(float(eval_step(
                state, place(val_windows[s:s + bs]), vrng)))
        val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
        history["val_loss"].append(val_loss)
        logging.info("EP %d done: train %.5f val %.5f perp %.1f", epoch,
                     meter.avg, val_loss, perp_m.avg)

        if (plot_every and save_dir and model.use_vq
                and (epoch + 1) % plot_every == 0):
            # per-epoch codebook t-SNE artifact
            # (ref: train_autoencoder_VQVAE.py:450-545)
            import os

            from gesture2vec_tpu.cluster.plots import plot_codebook_tsne
            plot_codebook_tsne(
                np.asarray(state.params["vq_layer"]["codebook"]),
                os.path.join(save_dir,
                             f"codebook_tsne_ep{epoch + 1:03d}.png"),
                title=f"{config.name} codebook ep{epoch + 1}")

        if save_dir and ((epoch + 1) % save_every == 0
                         or epoch + 1 == config.epochs):
            path = checkpoints.checkpoint_filename(
                save_dir, config.name, epoch + 1)
            checkpoints.save_checkpoint(
                path, config=config, epoch=epoch + 1, params=state.params,
                pose_dim=model.rep_dim,
                extra={"batch_stats": state.batch_stats,
                       "parity": parity,
                       **checkpoints.resume_extra(state, rng, config)},
                kind="autoencoder_vq" if model.use_vq else "autoencoder")
            logging.info("saved checkpoint %s", path)

    return state, history


@checkpoints.register_model_kind("autoencoder_vq")
def _build_seq_ae(config: Config, payload: dict):
    # registry loads serve inference/analysis: force fp32 compute even
    # for checkpoints trained with compute_dtype=bfloat16 - measured
    # 2.3x SLOWER at inference (per-step casts in the sequential scan,
    # benchmarks/README.md) and tokens must be fp32-exact anyway.
    # scan_unroll is likewise a training-throughput knob (numerics
    # identical); serving keeps the measured default.
    config = config.replace(compute_dtype="float32", scan_unroll=1)
    model = make_seq_ae(config, parity=bool(payload["extra"].get("parity",
                                                                 False)))
    variables = {"params": payload["params"],
                 "batch_stats": payload["extra"].get("batch_stats", {})}
    return model, variables


@checkpoints.register_model_kind("autoencoder")
def _build_seq_ae_plain(config: Config, payload: dict):
    return _build_seq_ae(config, payload)

"""Part a trainer: frame-level pose representation learning.

Rebuild of scripts/train_DAE.py (ref: train_DAE.py:65-371): same model
selection rules (DAE / VQ-frame / VAE by the autoencoder_vq and
autoencoder_vae flags), same losses (MSE + vq / KLD terms,
ref: train_eval/train_seq2seq.py:161-241), Adam(0.5, 0.999) with
grad-clip 5. The whole epoch runs as jitted steps over static-shape
batches; the denoising corruption is the model's input dropout driven
by a per-step PRNG key instead of torch global RNG.
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
from gesture2vec_tpu.models.dae import DAE, VAEFrame, VQFrame
from gesture2vec_tpu.models.vq import VQEmaState
from gesture2vec_tpu.train import checkpoints
from gesture2vec_tpu.train.config import Config
from gesture2vec_tpu.train.losses import mse_loss
from gesture2vec_tpu.train.optim import make_optimizer
from gesture2vec_tpu.train.token_loop import require_full_batch
from gesture2vec_tpu.utils.meters import AverageMeter


class DAETrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any          # VQFrame only ({} otherwise)
    vq_state: Optional[VQEmaState]
    step: jnp.ndarray


def make_frame_model(config: Config):
    """Model selection mirroring the reference's init_model flags
    (ref: train_DAE.py:65-117)."""
    set_scan_unroll(config.scan_unroll)
    motion_dim = config.input_motion_dim
    latent = config.hidden_size
    if config.autoencoder_vq:
        return VQFrame(motion_dim=motion_dim, latent_dim=latent,
                       vq_components=config.autoencoder_vq_components,
                       vae=config.autoencoder_vae,
                       commitment_cost=config.autoencoder_vq_commitment_cost)
    if config.autoencoder_vae:
        return VAEFrame(motion_dim=motion_dim, latent_dim=latent)
    return DAE(motion_dim=motion_dim, latent_dim=latent)


def init_state(config: Config, model, rng: jax.Array,
               optimizer: optax.GradientTransformation) -> DAETrainState:
    dummy = jnp.zeros((2, config.input_motion_dim), jnp.float32)
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1),
                 "reparam": jax.random.fold_in(rng, 2)}
    if isinstance(model, VQFrame):
        vq_state = VQFrame.init_vq_state(jax.random.fold_in(rng, 3),
                                         config.autoencoder_vq_components,
                                         config.hidden_size)
        variables = model.init(init_rngs, dummy, vq_state, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    else:
        vq_state = None
        variables = model.init(init_rngs, dummy, train=False)
        params = variables["params"]
        batch_stats = {}
    return DAETrainState(params=params,
                         opt_state=optimizer.init(params),
                         batch_stats=batch_stats, vq_state=vq_state,
                         step=jnp.zeros((), jnp.int32))


def make_train_step(config: Config, model,
                    optimizer: optax.GradientTransformation,
                    skip_vq: bool = False):
    """One jitted optimization step. Loss matches train_iter_DAE
    (ref: train_eval/train_seq2seq.py:194-241). skip_vq compiles the
    delayed-VQ warmup variant (ref: train_DAE.py:232-241)."""
    is_vq = isinstance(model, VQFrame)
    is_vae = isinstance(model, VAEFrame)

    def step(state: DAETrainState, batch: jnp.ndarray, rng: jax.Array):
        rngs = {"dropout": rng, "reparam": jax.random.fold_in(rng, 1)}

        def loss_fn(params):
            if is_vq:
                out, new_model_state = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch, state.vq_state, train=True, rngs=rngs,
                    skip_vq=skip_vq, mutable=["batch_stats"])
                res, new_vq = out
                rec = mse_loss(res["output"], batch)
                loss = rec + res["vq"].loss
                if config.autoencoder_vae:
                    # ref: train_seq2seq.py:224-230 (-2.5 coef, x5 weight)
                    loss = loss + 5 * (-2.5) * jnp.mean(jnp.mean(
                        1 + res["logvar"] - jnp.exp(res["logvar"])
                        - res["mean"] ** 2, axis=1))
                aux = {"rec": rec, "perplexity": res["vq"].perplexity,
                       "batch_stats": new_model_state["batch_stats"],
                       "vq_state": new_vq}
                return loss, aux
            if is_vae:
                out, logvar, mean = model.apply({"params": params}, batch,
                                                train=True, rngs=rngs)
                rec = mse_loss(out, batch)
                loss = rec + 5 * (-2.5) * jnp.mean(jnp.mean(
                    1 + logvar - jnp.exp(logvar) - mean ** 2, axis=1))
                return loss, {"rec": rec}
            out = model.apply({"params": params}, batch, train=True,
                              rngs=rngs)
            loss = mse_loss(out, batch)
            return loss, {"rec": loss}

        (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state._replace(
            params=new_params, opt_state=new_opt, step=state.step + 1,
            batch_stats=aux.pop("batch_stats", state.batch_stats),
            vq_state=aux.pop("vq_state", state.vq_state))
        return new_state, {"loss": loss, **aux}

    return jax.jit(step, donate_argnums=0)


def make_eval_step(config: Config, model):
    is_vq = isinstance(model, VQFrame)
    is_vae = isinstance(model, VAEFrame)

    def step(state: DAETrainState, batch: jnp.ndarray) -> jnp.ndarray:
        if is_vq:
            res, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch, state.vq_state, train=False)
            return mse_loss(res["output"], batch)
        if is_vae:
            out, _, _ = model.apply({"params": state.params}, batch,
                                    train=False)
            return mse_loss(out, batch)
        out = model.apply({"params": state.params}, batch, train=False)
        return mse_loss(out, batch)

    return jax.jit(step)


def reestimate_codebook(model, state: DAETrainState,
                        frames: np.ndarray, k: int,
                        batch: int = 4096) -> DAETrainState:
    """Re-fit the VQ codebook with K-Means over the current encoder
    latents (ref: train_DAE.py:241-263). The EMA state is reset so the
    new centers are the exact codebook (codebook = ema_w / cluster_size
    with cluster_size = 1)."""
    import jax.numpy as jnp

    from gesture2vec_tpu.cluster.kmeans import kmeans_fit
    from gesture2vec_tpu.models.vq import VQEmaState

    @jax.jit
    def encode(x):
        res, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, state.vq_state, train=False, skip_vq=True)
        return res["latent"]

    lats = []
    for s_ in range(0, frames.shape[0], batch):
        chunk = frames[s_:s_ + batch]
        if chunk.shape[0]:
            lats.append(np.asarray(encode(jnp.asarray(chunk))))
    latents = np.concatenate(lats, axis=0)
    km = kmeans_fit(latents, k, key=jax.random.PRNGKey(0), n_init=1,
                    max_iter=300)
    centers = jnp.asarray(km.centers)
    logging.info("codebook re-estimated from %d latents (inertia %.2f)",
                 latents.shape[0], float(km.inertia))
    # distinct buffers: donated states must not alias (codebook and
    # ema_w would otherwise be the same donated array)
    return state._replace(vq_state=VQEmaState(
        codebook=centers, cluster_size=jnp.ones((k,)),
        ema_w=jnp.array(centers, copy=True)))


def train_dae(config: Config, train_frames: np.ndarray,
              val_frames: np.ndarray, save_dir: Optional[str] = None,
              save_every: int = 10, log_every: int = 50,
              resume_from: Optional[str] = None,
              vq_tricks: bool = False, vq_start_epoch: int = 5,
              vq_reestimate_every: int = 5
              ) -> Tuple[DAETrainState, Dict[str, list]]:
    """Full Part-a training loop (ref: train_DAE.py:119-371).

    resume_from: checkpoint path; restores params/batch_stats/vq_state
    and continues from the stored epoch. When the checkpoint carries
    them (config.save_optimizer, the default) the optimizer state and
    PRNG key are restored too, making the resume bit-exact; otherwise
    the optimizer restarts like the reference's load_pretrained resume
    (ref: train_autoencoder_VQVAE.py:164-178)."""
    seed = max(config.random_seed, 0)
    rng = jax.random.PRNGKey(seed)
    model = make_frame_model(config)
    optimizer = make_optimizer(config.learning_rate)
    state = init_state(config, model, rng, optimizer)
    start_epoch = 0
    if resume_from:
        state, rng, start_epoch, payload = checkpoints.restore_for_resume(
            state, rng, resume_from)
        if payload["extra"].get("vq_state"):
            state = state._replace(
                vq_state=VQEmaState(**payload["extra"]["vq_state"]))
    # multi-chip: dp-sharded batches, replicated params (SURVEY.md §2.8)
    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    mesh, state = prepare_state(state, config.mesh_shape)
    place = batch_placer(mesh)
    if mesh is not None:
        logging.info("training over mesh %s", config.mesh_shape)
    train_step = make_train_step(config, model, optimizer)
    warmup_step = (make_train_step(config, model, optimizer, skip_vq=True)
                   if vq_tricks and isinstance(model, VQFrame) else None)
    eval_step = make_eval_step(config, model)

    # streaming source (data/streaming.StreamingFrames) or in-RAM array
    streaming = hasattr(train_frames, "batches")
    if streaming and vq_tricks:
        raise ValueError("vq_tricks needs the in-RAM frame array "
                        "(K-Means codebook re-estimation sweeps it)")
    n = len(train_frames) if streaming else train_frames.shape[0]
    bs = config.batch_size
    require_full_batch(n, bs, config.name)
    history: Dict[str, list] = {"train_loss": [], "val_loss": []}
    meter = AverageMeter("loss", ":.4f")

    from gesture2vec_tpu.utils.prefetch import prefetch

    for epoch in range(start_epoch, config.epochs):
        # VQ tricks (ref: train_DAE.py:230-263): delayed VQ start and
        # periodic K-Means re-estimation of the codebook
        step_fn = train_step
        if warmup_step is not None:
            if epoch < vq_start_epoch:
                step_fn = warmup_step
            elif epoch % vq_reestimate_every == 0:
                state = reestimate_codebook(
                    model, state, train_frames,
                    config.autoencoder_vq_components)
                if mesh is not None:
                    # keep the rebuilt EMA state on the mesh layout so
                    # the compiled step is not retraced
                    from gesture2vec_tpu.parallel.mesh import shard_params
                    state = state._replace(
                        vq_state=shard_params(state.vq_state, mesh))
        meter.reset()
        t0 = time.time()
        n_batches = n // bs
        if streaming:
            batches = prefetch(train_frames.batches(epoch, bs),
                               to_device=mesh is None)
        else:
            perm = np.random.default_rng(seed + epoch).permutation(n)
            batches = prefetch(
                (train_frames[perm[b * bs:(b + 1) * bs]]
                 for b in range(n_batches)), to_device=mesh is None)
        if mesh is not None:
            batches = (place(x) for x in batches)
        # metrics stay on device; float() would force a host sync per
        # step, so losses are fetched only at log points and epoch end
        losses = []
        for b, batch in enumerate(batches):
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            losses.append(metrics["loss"])
            if (b + 1) % log_every == 0:
                block = float(jnp.mean(jnp.stack(losses[-log_every:])))
                meter.update(block, bs * log_every)
                sps = (b + 1) * bs / (time.time() - t0)
                logging.info("EP %d (%d/%d) %s, %.0f samples/s",
                             epoch, b + 1, n_batches, meter, sps)
        # single batched device fetch for the epoch mean
        epoch_loss = (float(jnp.mean(jnp.stack(losses)))
                      if losses else float("nan"))
        meter.avg = epoch_loss
        history["train_loss"].append(epoch_loss)

        # evaluation (ref: train_DAE.py:314-371 evaluate_testset)
        val_losses = []
        for s in range(0, val_frames.shape[0] - bs + 1, bs):
            val_losses.append(float(eval_step(
                state, place(val_frames[s:s + bs]))))
        val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
        history["val_loss"].append(val_loss)
        logging.info("EP %d done: train %.5f val %.5f", epoch, meter.avg,
                     val_loss)

        if save_dir and ((epoch + 1) % save_every == 0
                         or epoch + 1 == config.epochs):
            path = checkpoints.checkpoint_filename(
                save_dir, f"{config.name}_H{config.hidden_size}", epoch + 1)
            extra = {"batch_stats": state.batch_stats,
                     **checkpoints.resume_extra(state, rng, config)}
            if state.vq_state is not None:
                extra["vq_state"] = state.vq_state._asdict()
            checkpoints.save_checkpoint(
                path, config=config, epoch=epoch + 1, params=state.params,
                pose_dim=config.input_motion_dim, extra=extra,
                kind="DAE")
            logging.info("saved checkpoint %s", path)

    return state, history


@checkpoints.register_model_kind("DAE")
def _build_dae(config: Config, payload: dict):
    model = make_frame_model(config)
    variables = {"params": payload["params"]}
    if payload["extra"].get("batch_stats"):
        variables["batch_stats"] = payload["extra"]["batch_stats"]
    return model, variables

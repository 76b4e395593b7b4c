"""Unrolled-GAN trainer for the text->gesture GAN variant.

Rebuild of train_iter_text2embedding_GAN
(ref: scripts/train_eval/train_seq2seq.py:541-661): per iteration the
discriminator takes one real update, then `unroll_steps` (10, ref :607)
further updates on the same batch, the generator steps against the
unrolled discriminator, and the discriminator is restored to its
post-first-update state (the unrolled-GAN recipe, Metz et al. 2016).
The whole unroll compiles into one program via lax.fori_loop.

Reference defect, repaired here behind a parity switch: the reference's
restore is a NO-OP - `d_backup = d_net.state_dict()` (ref :610) returns
references to the live parameter tensors, which `d_optim.step()`
mutates in place, so `load_state_dict(d_backup)` (ref :645) copies the
already-mutated values onto themselves. As committed, the reference
therefore keeps all 10 unrolled updates (~11 effective D steps per
iteration). The default here implements the intended restore;
`config.gan_keep_unrolled=True` reproduces the reference's literal
behavior. The reference also leaves gradient clipping commented out for
the GAN (ref :646-648), so both optimizers here are unclipped Adam.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from gesture2vec_tpu.models.gru import set_scan_unroll
from gesture2vec_tpu.models.gan import T2GDiscriminator, T2GGenerator


class GANTrainState(NamedTuple):
    g_params: Any
    g_opt: Any
    g_batch_stats: Any
    d_params: Any
    d_opt: Any
    step: jnp.ndarray


def _bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    labels = jnp.full_like(logits, target)
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def init_gan(g: T2GGenerator, d: T2GDiscriminator, rng: jax.Array,
             g_optimizer, d_optimizer, max_words: int = 48
             ) -> GANTrainState:
    toks = jnp.zeros((2, max_words), jnp.int32)
    lens = jnp.full((2,), max_words, jnp.int32)
    noise = jnp.zeros((2, g.noise_dim))
    seed = jnp.zeros((2, g.pose_dim))
    poses = jnp.zeros((2, g.n_frames, g.pose_dim))
    g_vars = g.init({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                    toks, lens, noise, seed, train=False)
    d_vars = d.init({"params": jax.random.fold_in(rng, 2),
                     "dropout": jax.random.fold_in(rng, 3)},
                    toks, lens, poses, train=False)
    return GANTrainState(
        g_params=g_vars["params"], g_opt=g_optimizer.init(g_vars["params"]),
        g_batch_stats=g_vars.get("batch_stats", {}),
        d_params=d_vars["params"], d_opt=d_optimizer.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32))


def make_gan_step(g: T2GGenerator, d: T2GDiscriminator, g_optimizer,
                  d_optimizer, unroll_steps: int = 10,
                  keep_unrolled: bool = False):
    def d_loss_fn(d_params, tokens, lengths, real, fake, rng):
        real_logit = d.apply({"params": d_params}, tokens, lengths, real,
                             train=True, rngs={"dropout": rng})
        fake_logit = d.apply({"params": d_params}, tokens, lengths, fake,
                             train=True,
                             rngs={"dropout": jax.random.fold_in(rng, 1)})
        real_err = _bce_with_logits(real_logit, 1.0)
        fake_err = _bce_with_logits(fake_logit, 0.0)
        return real_err + fake_err, (real_err, fake_err)

    def d_update(d_params, d_opt, tokens, lengths, real, fake, rng):
        (loss, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_params, tokens, lengths, real, fake, rng)
        updates, d_opt = d_optimizer.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, updates), d_opt, aux

    def step(state: GANTrainState, tokens, lengths, real_poses,
             rng: jax.Array):
        B = tokens.shape[0]
        rng_n, rng_d, rng_g, rng_u = jax.random.split(rng, 4)
        noise = jax.random.normal(rng_n, (B, g.noise_dim))
        seed_pose = real_poses[:, 0]

        # 1. fake batch from the current generator (no grad)
        fake, _ = g.apply(
            {"params": state.g_params,
             "batch_stats": state.g_batch_stats}, tokens, lengths, noise,
            seed_pose, train=True,
            rngs={"dropout": jax.random.fold_in(rng_g, 9)},
            mutable=["batch_stats"])
        fake = jax.lax.stop_gradient(fake)

        # 2. real D update
        d_params, d_opt, (real_err, fake_err) = d_update(
            state.d_params, state.d_opt, tokens, lengths, real_poses,
            fake, rng_d)

        # 3. unroll D further (ref :607-629)
        def unroll_body(i, carry):
            dp, dop = carry
            dp, dop, _ = d_update(dp, dop, tokens, lengths, real_poses,
                                  fake, jax.random.fold_in(rng_u, i))
            return dp, dop

        d_unrolled, d_opt_unrolled = jax.lax.fori_loop(
            0, unroll_steps, unroll_body, (d_params, d_opt))

        # 4. G step against the unrolled D
        def g_loss_fn(g_params):
            gen, mut = g.apply(
                {"params": g_params, "batch_stats": state.g_batch_stats},
                tokens, lengths, noise, seed_pose, train=True,
                rngs={"dropout": rng_g}, mutable=["batch_stats"])
            logit = d.apply({"params": d_unrolled}, tokens, lengths, gen,
                            train=False)
            return _bce_with_logits(logit, 1.0), mut["batch_stats"]

        (g_err, g_bs), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = g_optimizer.update(g_grads, state.g_opt,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # 5. D restored to its post-first-update state (the intended
        # ref :644-645); keep_unrolled reproduces the reference's
        # literal aliased-backup behavior (see module docstring)
        if keep_unrolled:
            d_params, d_opt = d_unrolled, d_opt_unrolled
        new_state = GANTrainState(g_params=g_params, g_opt=g_opt,
                                  g_batch_stats=g_bs, d_params=d_params,
                                  d_opt=d_opt, step=state.step + 1)
        return new_state, {"d_real": real_err, "d_fake": fake_err,
                           "g_loss": g_err}

    return jax.jit(step, donate_argnums=0)


def build_gan(config, n_words: int, pose_dim: int,
              embedding_weights=None
              ) -> Tuple[T2GGenerator, T2GDiscriminator]:
    set_scan_unroll(config.scan_unroll)
    g = T2GGenerator(n_words=n_words, pose_dim=pose_dim,
                     n_frames=config.n_poses,
                     hidden_size=config.hidden_size,
                     n_layers=config.n_layers,
                     noise_dim=config.noise_dim,
                     dropout=config.dropout_prob,
                     word_embed_size=config.wordembed_dim,
                     embedding_weights=embedding_weights)
    d = T2GDiscriminator(n_words=n_words, pose_dim=pose_dim,
                         hidden_size=config.hidden_size,
                         n_layers=config.n_layers,
                         dropout=config.dropout_prob,
                         word_embed_size=config.wordembed_dim,
                         embedding_weights=embedding_weights)
    return g, d


from gesture2vec_tpu.train import checkpoints  # noqa: E402


def train_gan(config, data, n_words: int, embedding_weights=None,
              save_dir=None) -> Tuple[GANTrainState, dict]:
    """Full unrolled-GAN training loop (ref: scripts/train_gan.py +
    train_eval/train_seq2seq.py:541-661). data: {word_ids (N,S),
    lengths (N,), poses (N,T,D)}. Honors config.mesh_shape: batches
    dp-sharded, generator/discriminator params replicated, the word
    embedding tables row-sharded over tp."""
    import logging

    import numpy as np

    from gesture2vec_tpu.parallel.mesh import batch_placer, prepare_state
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.utils.meters import AverageMeter

    g, d = build_gan(config, n_words, data["poses"].shape[-1],
                     embedding_weights=embedding_weights)
    # the reference GAN trainer does NOT clip gradients
    # (train_seq2seq.py:646-648, commented out)
    g_opt = make_optimizer(config.learning_rate, clip_norm=None)
    d_opt = make_optimizer(config.learning_rate, clip_norm=None)
    state = init_gan(g, d, jax.random.PRNGKey(max(config.random_seed, 0)),
                     g_opt, d_opt, max_words=data["word_ids"].shape[1])
    mesh, state = prepare_state(state, config.mesh_shape)
    place = batch_placer(mesh)
    if mesh is not None:
        logging.info("training over mesh %s", config.mesh_shape)
    step = make_gan_step(g, d, g_opt, d_opt,
                         keep_unrolled=config.gan_keep_unrolled)
    bs = config.batch_size
    meter = AverageMeter("g_loss", ":.4f")
    rng = jax.random.PRNGKey(max(config.random_seed, 0) + 1)
    n_samples = data["word_ids"].shape[0]
    if n_samples < bs:
        raise ValueError(f"GAN training needs at least one full batch "
                         f"({n_samples} windows < batch_size {bs})")
    history: dict = {"g_loss": [], "d_real": [], "d_fake": []}
    metrics = None
    for epoch in range(config.epochs):
        perm = np.random.default_rng(
            max(config.random_seed, 0) + epoch).permutation(n_samples)
        meter.reset()
        g_losses, d_reals, d_fakes = [], [], []
        for s in range(0, len(perm) - bs + 1, bs):
            take = perm[s:s + bs]
            rng, srng = jax.random.split(rng)
            state, metrics = step(state, place(data["word_ids"][take]),
                                  place(data["lengths"][take]),
                                  place(data["poses"][take]), srng)
            # deferred metric sync: one device fetch per epoch
            g_losses.append(metrics["g_loss"])
            d_reals.append(metrics["d_real"])
            d_fakes.append(metrics["d_fake"])
        epoch_g = (float(jnp.mean(jnp.stack(g_losses)))
                   if g_losses else float("nan"))
        meter.avg = epoch_g
        history["g_loss"].append(epoch_g)
        # epoch means like g_loss (last-batch values are noise)
        history["d_real"].append(float(jnp.mean(jnp.stack(d_reals))))
        history["d_fake"].append(float(jnp.mean(jnp.stack(d_fakes))))
        logging.info("EP %d done: g %.4f d_real %.4f d_fake %.4f", epoch,
                     meter.avg, history["d_real"][-1],
                     history["d_fake"][-1])
    if save_dir:
        path = checkpoints.checkpoint_filename(save_dir, config.name,
                                               config.epochs)
        checkpoints.save_checkpoint(
            path, config=config, epoch=config.epochs, params=state.g_params,
            pose_dim=data["poses"].shape[-1],
            extra={"batch_stats": state.g_batch_stats,
                   "d_params": state.d_params, "n_words": n_words},
            kind="text2embedding_gan")
        logging.info("saved checkpoint %s", path)
    return state, history


@checkpoints.register_model_kind("text2embedding_gan")
def _build_gan_generator(config, payload: dict):
    """Rebuild the GAN generator from a checkpoint (the reference's
    'text2embedding_gan' registry kind, ref: utils/train_utils.py:116)."""
    g, _ = build_gan(config, int(payload["extra"]["n_words"]),
                     int(payload["pose_dim"]))
    return g, {"params": payload["params"],
               "batch_stats": payload["extra"].get("batch_stats", {})}

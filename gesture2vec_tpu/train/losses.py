"""Loss functions shared across training parts.

Rebuilds the reference's loss math exactly
(ref: scripts/train_eval/train_seq2seq.py:40-88 custom_loss;
:198-230 DAE losses; :692-738 VQ seq2seq loss; :499-530 text CE).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def custom_loss(output: jnp.ndarray, target: jnp.ndarray, *,
                l1_weight: float, cont_weight: float,
                var_weight: float) -> jnp.ndarray:
    """Weighted L1 + continuity + (negative) variance loss.

    output/target: (B, T, D). Matches ref train_seq2seq.py:40-88:
      l1   = mean |out - tgt| * w_l1
      cont = sum_t |out_t - out_{t-1}| / numel * w_cont
      var  = -sum(norm2(out, axis=1)) / numel * w_var
    Note the reference divides the cont and var sums by output.numel(),
    not by the reduced element count - kept identical.
    """
    n_element = output.size
    l1 = jnp.mean(jnp.abs(output - target)) * l1_weight
    diff = jnp.abs(output[:, 1:, :] - output[:, :-1, :])
    cont = jnp.sum(diff) / n_element * cont_weight
    norm = jnp.linalg.norm(output, ord=2, axis=1)
    var = -jnp.sum(norm) / n_element * var_weight
    return l1 + cont + var


def mse_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((output - target) ** 2)


def kld_loss(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """-0.5 * mean_b mean_d (1 + logvar - exp(logvar) - mu^2)
    (ref: train_seq2seq.py:288-290)."""
    return -0.5 * jnp.mean(jnp.mean(1 + logvar - jnp.exp(logvar)
                                    - mean ** 2, axis=1))


def kld_loss_standard(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """0.5 * mean(exp(logvar) - logvar - 1 + mu^2)
    (ref: train_seq2seq.py:715, used by the VQ seq2seq VAE branch)."""
    return 0.5 * jnp.mean(jnp.exp(logvar) - logvar - 1 + mean ** 2)


def token_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                        ignore_first: bool = True,
                        label_smoothing: float = 0.0) -> jnp.ndarray:
    """CE over gesture-token logits, skipping position 0 like the
    reference (ref: train_seq2seq.py:520-530 slices [:, 1:]).

    label_smoothing (beyond reference, opt-in via config
    `label_smoothing`): standard smoothed-target CE — a training
    regularizer for Part d's overfitting-prone token translation.
    0.0 (default) is the reference's plain integer-label CE; eval
    paths always use 0.0 so reported val CE stays comparable."""
    if ignore_first:
        logits = logits[:, 1:, :]
        targets = targets[:, 1:]
    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_targets = targets.reshape(-1).astype(jnp.int32)
    if label_smoothing:
        onehot = jax.nn.one_hot(flat_targets, flat_logits.shape[-1])
        labels = optax.smooth_labels(onehot, label_smoothing)
        return optax.softmax_cross_entropy(flat_logits, labels).mean()
    return optax.softmax_cross_entropy_with_integer_labels(
        flat_logits, flat_targets).mean()

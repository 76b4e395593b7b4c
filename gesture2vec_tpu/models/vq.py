"""Vector-quantization layers: straight-through, EMA, GS-Soft, Gumbel.

Functional rebuild of the reference's VQ layer zoo
(ref: scripts/model/DAE_model.py:277-597 for the frame-level variants,
scripts/model/Autoencoder_VQVAE_model.py:1088-1440 for the sequence-level
variants). Two TPU-native design changes:

1.  EMA codebook state (codebook, cluster_size, ema_w) is an explicit
    pytree threaded through the step function instead of nn.Parameter
    mutation inside forward (ref: Autoencoder_VQVAE_model.py:1262-1282) -
    required for jit purity and for checkpointing the true training state.
2.  The EMA statistics (one-hot counts, assigned-vector sums) are plain
    batch sums, so under data parallelism they are jax.lax.psum'd across
    the mesh before the decay update - the EMA math then distributes
    exactly (every device applies the same update to a replicated state).

The quantizer actually shipped by the reference per stage:
  Part a (frame DAE + VQ): VQ_Payam_EMA, decay=0.99
    (ref: DAE_model.py:161-169)
  Part b (seq autoencoder): VQ_Payam_GSSoft - the __init__ builds an EMA
    quantizer then unconditionally overwrites it
    (ref: Autoencoder_VQVAE_model.py:816-820).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class VQOutput(NamedTuple):
    loss: jnp.ndarray          # scalar codebook/commitment loss
    quantized: jnp.ndarray     # straight-through quantized inputs
    perplexity: jnp.ndarray    # codebook-usage perplexity
    encodings: jnp.ndarray     # (N, K) assignment weights (hard or soft)


class VQEmaState(NamedTuple):
    """EMA codebook state (explicit, checkpointable)."""

    codebook: jnp.ndarray      # (K, D)
    cluster_size: jnp.ndarray  # (K,)
    ema_w: jnp.ndarray         # (K, D)


def init_ema_state(key: jax.Array, num_codes: int, dim: int) -> VQEmaState:
    """Matches reference init: codebook ~ U(-1/K, 1/K), ema_w ~ N(0,1)
    (ref: DAE_model.py:382-391)."""
    k1, k2 = jax.random.split(key)
    codebook = jax.random.uniform(k1, (num_codes, dim),
                                  minval=-1.0 / num_codes,
                                  maxval=1.0 / num_codes)
    ema_w = jax.random.normal(k2, (num_codes, dim))
    return VQEmaState(codebook=codebook,
                      cluster_size=jnp.zeros((num_codes,)), ema_w=ema_w)


def codebook_distances(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances (N, K) = |x|^2 + |e|^2 - 2 x e^T
    (ref: DAE_model.py:320-324). fp32 matmul - token identity depends on
    exact argmin, so no bf16 passes here."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    e2 = jnp.sum(codebook * codebook, axis=-1)
    xe = jnp.matmul(x, codebook.T, precision="highest")
    return x2 + e2 - 2.0 * xe


def perplexity_of(encodings: jnp.ndarray) -> jnp.ndarray:
    avg = jnp.mean(encodings, axis=0)
    return jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))


def _hard_assign(distances: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    indices = jnp.argmin(distances, axis=-1)
    onehot = jax.nn.one_hot(indices, distances.shape[-1],
                            dtype=distances.dtype)
    return indices, onehot


def vq_st(x: jnp.ndarray, codebook: jnp.ndarray,
          commitment_cost: float = 0.25) -> VQOutput:
    """Plain straight-through VQ (ref: DAE_model.py:301-348 VQ_Payam).

    loss = |sg(x) - e|^2 + beta |x - sg(e)|^2; gradient flows to both the
    codebook (q term) and the encoder (commitment term + STE).
    """
    shape = x.shape
    flat = x.reshape(-1, codebook.shape[-1])
    d = codebook_distances(flat, codebook)
    _, onehot = _hard_assign(d)
    quantized = (onehot @ codebook).reshape(shape)

    e_latent = jnp.mean((jax.lax.stop_gradient(quantized) - x) ** 2)
    q_latent = jnp.mean((quantized - jax.lax.stop_gradient(x)) ** 2)
    loss = q_latent + commitment_cost * e_latent
    st = x + jax.lax.stop_gradient(quantized - x)
    return VQOutput(loss, st, perplexity_of(onehot), onehot)


def vq_ema(x: jnp.ndarray, state: VQEmaState, *,
           commitment_cost: float = 0.25, decay: float = 0.99,
           epsilon: float = 1e-5, train: bool = True,
           axis_name: Optional[str] = None
           ) -> Tuple[VQOutput, VQEmaState]:
    """EMA-codebook VQ (ref: DAE_model.py:396-482 VQ_Payam_EMA).

    loss = beta * |sg(e) - x|^2 only (codebook learns via EMA, not grads).
    When axis_name is set, per-batch statistics are psum'd so the update
    is identical on every data-parallel shard.
    """
    shape = x.shape
    flat = x.reshape(-1, state.codebook.shape[-1])
    d = codebook_distances(flat, state.codebook)
    _, onehot = _hard_assign(d)
    quantized = (onehot @ state.codebook).reshape(shape)

    new_state = state
    if train:
        counts = jnp.sum(onehot, axis=0)                  # (K,)
        dw = jnp.matmul(onehot.T, flat, precision="highest")  # (K, D)
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
            dw = jax.lax.psum(dw, axis_name)
        cluster_size = state.cluster_size * decay + (1 - decay) * counts
        n = jnp.sum(cluster_size)
        cluster_size = ((cluster_size + epsilon) /
                        (n + state.codebook.shape[0] * epsilon) * n)
        ema_w = state.ema_w * decay + (1 - decay) * dw
        codebook = ema_w / cluster_size[:, None]
        new_state = VQEmaState(codebook=codebook, cluster_size=cluster_size,
                               ema_w=ema_w)
        # the quantized value this step still uses the pre-update codebook,
        # matching the reference's order of operations
        # (ref: DAE_model.py:444-471: quantize first, then EMA update).

    e_latent = jnp.mean((jax.lax.stop_gradient(quantized) - x) ** 2)
    loss = commitment_cost * e_latent
    st = x + jax.lax.stop_gradient(quantized - x)
    return VQOutput(loss, st, perplexity_of(onehot), onehot), new_state


def gssoft_probs(distances: jnp.ndarray,
                 z_logvar: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-smoothed soft assignment
    (ref: Autoencoder_VQVAE_model.py:1349-1372 soft_prob):
    smooth = exp(z_logvar)^-2, p ~ exp(-(d/400) * smooth/2) / sqrt(smooth).

    Computed in log space with a softmax (identical math): the
    reference's direct form underflows to 0/0 = NaN once training
    sharpens the assignment - with smooth ~ 1e4 and d/400 ~ 5 every
    code's exp() is 0 and the row sum vanishes. That NaN is reachable in
    practice (a 12-step collapse on a corpus-scale run poisoned the
    whole model); log-space + max-subtraction keeps the exact same
    distribution finite. log_smooth is clamped to +-30 (smooth in
    [1e-13, 1e13]) - far outside the useful smoothing range, where the
    assignment is already exactly one-hot/uniform at fp32, so the clamp
    cannot change any realizable assignment, only prevent inf*0."""
    log_smooth = jnp.clip(-2.0 * z_logvar, -30.0, 30.0)
    smooth = jnp.exp(log_smooth)
    logp = -(distances / 400.0) * 0.5 * smooth - 0.5 * log_smooth
    return jax.nn.softmax(logp, axis=1)


class VQGSSoft(nn.Module):
    """GS-Soft VQ: the Part-b quantizer actually in effect
    (ref: Autoencoder_VQVAE_model.py:1304-1433 VQ_Payam_GSSoft).

    A mean layer projects the input before distance computation; a logvar
    head produces per-code smoothing; assignment is the normalized
    Gaussian-kernel soft weighting; loss is the usual q + beta*e pair on
    the softly quantized vector. Codebook is a gradient-trained parameter
    (normal init, ref line 1322).
    """

    num_codes: int
    dim: int
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> VQOutput:
        codebook = self.param("codebook", nn.initializers.normal(1.0),
                              (self.num_codes, self.dim))
        flat = x.reshape(-1, self.dim)
        # token-identity path: these projections feed the distance
        # argmax, so they run at HIGHEST like codebook_distances (the
        # TPU default's bf16 passes can flip near-tie assignments)
        projected = nn.Dense(self.dim, name="mean_layer",
                             precision="highest")(flat)
        z_logvar = nn.Dense(self.num_codes, name="logvar_layer",
                            precision="highest")(projected)

        d = codebook_distances(projected, codebook)
        probs = gssoft_probs(d, z_logvar)
        quantized = jnp.matmul(probs, codebook,
                               precision="highest").reshape(x.shape)

        e_latent = jnp.mean((jax.lax.stop_gradient(quantized) - x) ** 2)
        q_latent = jnp.mean((quantized - jax.lax.stop_gradient(x)) ** 2)
        loss = q_latent + self.commitment_cost * e_latent
        st = x + jax.lax.stop_gradient(quantized - x)
        return VQOutput(loss, st, perplexity_of(probs), probs)

    def tokens(self, probs: jnp.ndarray) -> jnp.ndarray:
        """Discrete gesture-token ids = argmax of the soft assignment
        (ref: scripts/data_loader/lmdb_data_loader.py:1274-1281)."""
        return jnp.argmax(probs, axis=-1)


class VQResidual(nn.Module):
    """Residual VQ, an opt-in quantizer beyond the reference (see
    PAPERS.md: RVQ pose representations, MoMask): stage 0 quantizes the
    input; each later stage quantizes what the previous stages left
    over, with its own codebook; the bottleneck becomes the sum of the
    stage codes.

    Pipeline compatibility: stage 0's index remains THE gesture token.
    Its codebook is stored under the same param name ("codebook") every
    consumer reads (t-SNE plots, decode_codebook, exemplar retrieval,
    Part-d targets), and `encodings`/`perplexity` are stage-0 only, so
    the discrete token pipeline is unchanged while reconstruction
    tightens with each residual stage
    (tests/test_vq.py::test_rvq_refines_reconstruction).
    """

    num_codes: int
    dim: int
    stages: int = 2
    commitment_cost: float = 0.25

    def setup(self):
        # setup-style (not @nn.compact) so stage_tokens /
        # embed_stage_tokens can reuse the same parameters; names are
        # unchanged ("codebook", "codebook_r{s}") so every existing
        # consumer and checkpoint keeps working
        self.codebooks = [
            self.param("codebook" if s == 0 else f"codebook_r{s}",
                       nn.initializers.normal(1.0),
                       (self.num_codes, self.dim))
            for s in range(self.stages)]

    def __call__(self, x: jnp.ndarray) -> VQOutput:
        flat = x.reshape(-1, self.dim)
        resid = flat
        total_q = jnp.zeros_like(flat)
        loss = jnp.zeros(())
        out0 = None
        for s in range(self.stages):
            cb = self.codebooks[s]
            d = codebook_distances(resid, cb)
            _, onehot = _hard_assign(d)
            q = jnp.matmul(onehot, cb, precision="highest")
            e_latent = jnp.mean((jax.lax.stop_gradient(q) - resid) ** 2)
            q_latent = jnp.mean((q - jax.lax.stop_gradient(resid)) ** 2)
            loss = loss + q_latent + self.commitment_cost * e_latent
            total_q = total_q + q
            if s == 0:
                out0 = onehot
            # later stages see the residual of the *quantized* path so
            # every stage's commitment term is a function of x
            resid = resid - jax.lax.stop_gradient(q)
        st = (flat + jax.lax.stop_gradient(total_q - flat)).reshape(x.shape)
        return VQOutput(loss, st, perplexity_of(out0), out0)

    def tokens(self, probs: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(probs, axis=-1)

    def stage_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, dim) -> (N, stages) per-stage hard code ids. Column 0 is
        THE pipeline gesture token (identical to tokens()); columns >0
        index the residual-stage codebooks — the extra information a
        multi-stage Part d can carry to the decoder."""
        resid = x.reshape(-1, self.dim)
        toks = []
        for cb in self.codebooks:
            # checkpoint-loaded params may be numpy; traced indexing
            # needs a jax array
            cb = jnp.asarray(cb)
            idx = jnp.argmin(codebook_distances(resid, cb), axis=-1)
            toks.append(idx)
            resid = resid - cb[idx]
        return jnp.stack(toks, axis=1)

    def embed_stage_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(..., S') stage ids -> (..., dim): sum of the first S' stage
        codebook rows (the decode-side inverse of stage_tokens; a
        stage-0-only column reproduces the single-token decode path)."""
        total = jnp.asarray(self.codebooks[0])[tokens[..., 0]]
        for s in range(1, tokens.shape[-1]):
            total = total + jnp.asarray(self.codebooks[s])[tokens[..., s]]
        return total


def vq_gumbel(x: jnp.ndarray, codebook: jnp.ndarray, rng: jax.Array, *,
              temperature: float = 0.5, train: bool = True) -> VQOutput:
    """Relaxed one-hot (Gumbel-softmax) VQ
    (ref: DAE_model.py:485-594 VQ_Payam_GSOFT): sample relaxed one-hot
    from logits = -distances in training; hard argmax of the categorical
    probabilities in eval. Loss is the KL to the uniform prior.
    """
    flat = x.reshape(-1, codebook.shape[-1])
    d = codebook_distances(flat, codebook)
    logits = -d / temperature
    log_probs = jax.nn.log_softmax(-d, axis=-1)
    probs = jnp.exp(log_probs)

    if train:
        g = jax.random.gumbel(rng, d.shape, dtype=d.dtype)
        encodings = jax.nn.softmax(logits + g / temperature, axis=-1)
    else:
        _, encodings = _hard_assign(d)

    quantized = jnp.matmul(encodings, codebook,
                           precision="highest").reshape(x.shape)
    # KL(q || uniform) = sum_k q log q + log K, zeros masked like the ref
    kl_el = probs * (log_probs + jnp.log(float(codebook.shape[0])))
    kl_el = jnp.where(probs == 0, 0.0, kl_el)
    kl = jnp.mean(jnp.sum(kl_el, axis=0))

    st = x + jax.lax.stop_gradient(quantized - x)
    return VQOutput(kl, st, perplexity_of(encodings), encodings)

"""GRU recurrence as lax.scan, weight-compatible with torch.nn.GRU.

The reference's hot loops are all GRU recurrences
(ref: scripts/model/Autoencoder_VQVAE_model.py:66-100 encoder,
:482-592 decoder; scripts/model/text2embedding_model.py:96-135): PyTorch
cuDNN GRUs called step by step from Python. Here the recurrence compiles
to a single lax.scan and - crucially for TPU - the input-side gate
projections for ALL timesteps are hoisted out of the scan into one large
(T*B, in) x (in, 3H) matmul that XLA tiles onto the MXU, leaving only the
(B, H) x (H, 3H) hidden matmul inside the sequential loop.

Gate math matches torch exactly (gate order r, z, n; separate input and
hidden biases) so that checkpoints converted from the PyTorch reference
reproduce bit-comparable trajectories:
    r = sigmoid(x W_ir^T + b_ir + h W_hr^T + b_hr)
    z = sigmoid(x W_iz^T + b_iz + h W_hz^T + b_hz)
    n = tanh(x W_in^T + b_in + r * (h W_hn^T + b_hn))
    h' = (1 - z) * n + z * h
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


_SCAN_UNROLL = 1


def set_scan_unroll(n: int) -> None:
    """Unroll factor for every GRU/decoder lax.scan (trace-time knob; set
    before jit). >1 trades compile time and code size for fewer
    while-loop iterations — worth measuring per hardware, since on a
    dispatch-floor-bound link the loop overhead may not be visible."""
    global _SCAN_UNROLL
    _SCAN_UNROLL = max(1, int(n))


def scan_unroll() -> int:
    return _SCAN_UNROLL


def make_decoder_scan(body, train: bool, length: Optional[int] = None):
    """nn.scan config shared by every autoregressive decoder rollout
    (seq-AE, text2token, audio2token, baseline, c2g, GAN): params
    broadcast, per-step dropout rngs, batch_stats carried in train mode,
    and the global scan-unroll knob applied."""
    kw = dict(split_rngs={"params": False, "dropout": True,
                          "sample": True},
              in_axes=0, out_axes=0, unroll=_SCAN_UNROLL)
    if length is not None:
        kw["length"] = length
    if train:
        return nn.scan(body, variable_broadcast="params",
                       variable_carry="batch_stats", **kw)
    return nn.scan(body, variable_broadcast=("params", "batch_stats"),
                   **kw)


def _uniform_init(hidden_size: int):
    """torch.nn.GRU default init: U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / jnp.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _cast_gru(dtype, *arrays):
    """Optional compute-dtype cast for the opt-in bf16 training mode.
    dtype None keeps the fp32/HIGHEST default (token-identity safe)."""
    if dtype is None:
        return arrays
    return tuple(a.astype(dtype) for a in arrays)


def gru_layer(xs_tm: jnp.ndarray, h0: jnp.ndarray, w_ih: jnp.ndarray,
              w_hh: jnp.ndarray, b_ih: jnp.ndarray, b_hh: jnp.ndarray,
              reverse: bool = False,
              dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One GRU layer over a full sequence.

    xs_tm: (T, B, in) time-major inputs. h0: (B, H). Returns
    (outputs (T, B, H), final hidden (B, H)).

    dtype None (default): fp32 precision="highest" throughout -
    gesture-token identity flows through these activations into the VQ
    argmin, and the TPU default (bf16 passes) perturbs it by ~1e-2.
    dtype=bfloat16: single-pass MXU matmuls for throughput-first
    training (config.compute_dtype).
    """
    h_size = h0.shape[-1]
    prec = "highest" if dtype is None else None
    xs_tm, h0, w_ih, w_hh, b_ih, b_hh = _cast_gru(
        dtype, xs_tm, h0, w_ih, w_hh, b_ih, b_hh)
    # hoist input projections out of the recurrence: one big MXU matmul
    x_proj = jnp.matmul(xs_tm, w_ih.T, precision=prec) + b_ih

    def step(h, xp):
        gh = jnp.matmul(h, w_hh.T, precision=prec) + b_hh
        r = jax.nn.sigmoid(xp[..., :h_size] + gh[..., :h_size])
        z = jax.nn.sigmoid(xp[..., h_size:2 * h_size] +
                           gh[..., h_size:2 * h_size])
        n = jnp.tanh(xp[..., 2 * h_size:] + r * gh[..., 2 * h_size:])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, x_proj, reverse=reverse,
                              unroll=_SCAN_UNROLL)
    return ys, h_last


class GRU(nn.Module):
    """Multi-layer unidirectional GRU (torch.nn.GRU semantics).

    Input/output are time-major (T, B, ...). Inter-layer dropout is
    applied to the outputs of every layer but the last when train=True,
    like torch. Hidden state is (n_layers, B, H).
    """

    hidden_size: int
    n_layers: int = 1
    dropout: float = 0.0
    dtype: Optional[Any] = None   # None=fp32/HIGHEST; jnp.bfloat16 opt-in

    @nn.compact
    def __call__(self, xs: jnp.ndarray, h0: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H = self.hidden_size
        init = _uniform_init(H)
        if h0 is None:
            h0 = jnp.zeros((self.n_layers, xs.shape[1], H), xs.dtype)
        outs = xs
        h_finals = []
        for layer in range(self.n_layers):
            in_dim = outs.shape[-1]
            w_ih = self.param(f"l{layer}_w_ih", init, (3 * H, in_dim))
            w_hh = self.param(f"l{layer}_w_hh", init, (3 * H, H))
            b_ih = self.param(f"l{layer}_b_ih", init, (3 * H,))
            b_hh = self.param(f"l{layer}_b_hh", init, (3 * H,))
            outs, h_last = gru_layer(outs, h0[layer], w_ih, w_hh, b_ih,
                                     b_hh, dtype=self.dtype)
            h_finals.append(h_last)
            if train and self.dropout > 0 and layer < self.n_layers - 1:
                outs = nn.Dropout(self.dropout, deterministic=False)(outs)
        return outs, jnp.stack(h_finals, axis=0)


class BiGRU(nn.Module):
    """Multi-layer bidirectional GRU (torch.nn.GRU bidirectional=True).

    Per layer, forward and backward passes consume the concatenated (2H)
    outputs of the previous layer. Returned hidden is
    (n_layers*2, B, H) ordered [l0_fwd, l0_bwd, l1_fwd, l1_bwd, ...],
    identical to torch, because downstream code slices [:n_layers] of it
    (ref: scripts/model/Autoencoder_VQVAE_model.py:971-973).
    Output is (T, B, 2H) concatenated directions.
    """

    hidden_size: int
    n_layers: int = 1
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray, h0: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H = self.hidden_size
        init = _uniform_init(H)
        if h0 is None:
            h0 = jnp.zeros((self.n_layers * 2, xs.shape[1], H), xs.dtype)
        outs = xs
        h_finals = []
        for layer in range(self.n_layers):
            in_dim = outs.shape[-1]
            ys = []
            for d, (suffix, reverse) in enumerate((("", False),
                                                   ("_reverse", True))):
                w_ih = self.param(f"l{layer}_w_ih{suffix}", init,
                                  (3 * H, in_dim))
                w_hh = self.param(f"l{layer}_w_hh{suffix}", init, (3 * H, H))
                b_ih = self.param(f"l{layer}_b_ih{suffix}", init, (3 * H,))
                b_hh = self.param(f"l{layer}_b_hh{suffix}", init, (3 * H,))
                y, h_last = gru_layer(outs, h0[2 * layer + d], w_ih, w_hh,
                                      b_ih, b_hh, reverse=reverse,
                                      dtype=self.dtype)
                ys.append(y)
                h_finals.append(h_last)
            outs = jnp.concatenate(ys, axis=-1)
            if train and self.dropout > 0 and layer < self.n_layers - 1:
                outs = nn.Dropout(self.dropout, deterministic=False)(outs)
        return outs, jnp.stack(h_finals, axis=0)


def _reverse_padded(xs_tm: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence within its own valid length.

    xs_tm (T, B, D), lengths (B,). Positions >= length become zeros -
    the semantics of torch's pack_padded_sequence + reversed direction.
    """
    T = xs_tm.shape[0]
    t_idx = jnp.arange(T)[:, None]                       # (T, 1)
    src = lengths[None, :] - 1 - t_idx                   # (T, B)
    valid = src >= 0
    src = jnp.clip(src, 0, T - 1)
    gathered = jnp.take_along_axis(
        xs_tm, src[:, :, None].astype(jnp.int32), axis=0)
    return jnp.where(valid[:, :, None], gathered, 0.0)


def masked_gru_layer(xs_tm: jnp.ndarray, lengths: jnp.ndarray,
                     h0: jnp.ndarray, w_ih: jnp.ndarray, w_hh: jnp.ndarray,
                     b_ih: jnp.ndarray, b_hh: jnp.ndarray,
                     reverse: bool = False, dtype=None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GRU layer with per-sequence lengths: the final hidden freezes at
    each sequence's last valid step and padded outputs are zero, matching
    torch pack_padded_sequence semantics
    (ref: scripts/model/text2embedding_model.py:127-131).
    dtype as in gru_layer: None = fp32/HIGHEST, bfloat16 opt-in."""
    if reverse:
        xs_tm = _reverse_padded(xs_tm, lengths)
    h_size = h0.shape[-1]
    prec = "highest" if dtype is None else None
    xs_tm, h0, w_ih, w_hh, b_ih, b_hh = _cast_gru(
        dtype, xs_tm, h0, w_ih, w_hh, b_ih, b_hh)
    x_proj = jnp.matmul(xs_tm, w_ih.T, precision=prec) + b_ih

    def step(carry, inp):
        h, t = carry
        xp = inp
        gh = jnp.matmul(h, w_hh.T, precision=prec) + b_hh
        r = jax.nn.sigmoid(xp[..., :h_size] + gh[..., :h_size])
        z = jax.nn.sigmoid(xp[..., h_size:2 * h_size] +
                           gh[..., h_size:2 * h_size])
        n = jnp.tanh(xp[..., 2 * h_size:] + r * gh[..., 2 * h_size:])
        h_new = (1.0 - z) * n + z * h
        alive = (t < lengths)[:, None]
        h_keep = jnp.where(alive, h_new, h)
        y = jnp.where(alive, h_new, 0.0)
        return (h_keep, t + 1), y

    (h_last, _), ys = jax.lax.scan(step, (h0, jnp.zeros((), jnp.int32)),
                                   x_proj, unroll=_SCAN_UNROLL)
    if reverse:
        ys = _reverse_padded(ys, lengths)
    return ys, h_last


class MaskedBiGRU(nn.Module):
    """Bidirectional GRU over padded sequences with lengths - torch
    packed-sequence equivalent. Same parameter naming as BiGRU."""

    hidden_size: int
    n_layers: int = 1
    dropout: float = 0.0
    dtype: Optional[Any] = None   # None=fp32/HIGHEST; jnp.bfloat16 opt-in

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H = self.hidden_size
        init = _uniform_init(H)
        outs = xs
        h_finals = []
        for layer in range(self.n_layers):
            in_dim = outs.shape[-1]
            ys = []
            for d, (suffix, reverse) in enumerate((("", False),
                                                   ("_reverse", True))):
                w_ih = self.param(f"l{layer}_w_ih{suffix}", init,
                                  (3 * H, in_dim))
                w_hh = self.param(f"l{layer}_w_hh{suffix}", init, (3 * H, H))
                b_ih = self.param(f"l{layer}_b_ih{suffix}", init, (3 * H,))
                b_hh = self.param(f"l{layer}_b_hh{suffix}", init, (3 * H,))
                h0 = jnp.zeros((xs.shape[1], H), xs.dtype)
                y, h_last = masked_gru_layer(outs, lengths, h0, w_ih, w_hh,
                                             b_ih, b_hh, reverse=reverse,
                                             dtype=self.dtype)
                ys.append(y)
                h_finals.append(h_last)
            outs = jnp.concatenate(ys, axis=-1)
            if train and self.dropout > 0 and layer < self.n_layers - 1:
                outs = nn.Dropout(self.dropout, deterministic=False)(outs)
        return outs, jnp.stack(h_finals, axis=0)


def gru_cell(x: jnp.ndarray, h: jnp.ndarray, w_ih: jnp.ndarray,
             w_hh: jnp.ndarray, b_ih: jnp.ndarray,
             b_hh: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Single GRU step (B, in) x (B, H) -> (B, H), used by autoregressive
    decoders whose per-step input depends on the previous output."""
    H = h.shape[-1]
    prec = "highest" if dtype is None else None
    x, h, w_ih, w_hh, b_ih, b_hh = _cast_gru(dtype, x, h, w_ih, w_hh,
                                             b_ih, b_hh)
    gi = jnp.matmul(x, w_ih.T, precision=prec) + b_ih
    gh = jnp.matmul(h, w_hh.T, precision=prec) + b_hh
    r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gi[..., H:2 * H] + gh[..., H:2 * H])
    n = jnp.tanh(gi[..., 2 * H:] + r * gh[..., 2 * H:])
    return (1.0 - z) * n + z * h


class GRUCellStack(nn.Module):
    """n_layers of GRU cells for one timestep: the in-scan body of the
    reference's step-by-step decoders. Hidden is (n_layers, B, H)."""

    hidden_size: int
    n_layers: int = 1
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H = self.hidden_size
        init = _uniform_init(H)
        outs = x
        new_h = []
        for layer in range(self.n_layers):
            in_dim = outs.shape[-1]
            w_ih = self.param(f"l{layer}_w_ih", init, (3 * H, in_dim))
            w_hh = self.param(f"l{layer}_w_hh", init, (3 * H, H))
            b_ih = self.param(f"l{layer}_b_ih", init, (3 * H,))
            b_hh = self.param(f"l{layer}_b_hh", init, (3 * H,))
            outs = gru_cell(outs, h[layer], w_ih, w_hh, b_ih, b_hh,
                            dtype=self.dtype)
            new_h.append(outs)
            if train and self.dropout > 0 and layer < self.n_layers - 1:
                outs = nn.Dropout(self.dropout, deterministic=False)(outs)
        return outs, jnp.stack(new_h, axis=0)

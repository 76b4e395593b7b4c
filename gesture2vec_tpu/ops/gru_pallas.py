"""Pallas TPU kernel: fused full-sequence GRU recurrence.

The autoregressive/recurrent GRU is the framework's serial bottleneck
(SURVEY.md section 7.3). The lax.scan version already hoists the input
projections into one big MXU matmul; what remains inside the loop is a
small (B, H) x (H, 3H) matmul plus elementwise gates per step, each a
separate XLA loop iteration with HBM round-trips for the carry. This
kernel runs the whole T-step recurrence in ONE Pallas program: the
hidden state, the recurrent weights, and the per-step gate inputs stay
resident in VMEM for the entire sequence.

Forward-only (inference/teacher sweeps): training keeps the scan path,
whose autodiff XLA handles well. Use supported() to gate on VMEM budget.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _gru_seq_kernel(xp_ref, h0_ref, whht_ref, bhh_ref, ys_ref, hlast_ref):
    """xp (T, B, 3H) precomputed input projections (incl. b_ih),
    h0 (B, H), whht (H, 3H) transposed recurrent weights, bhh (1, 3H)."""
    T = xp_ref.shape[0]
    H = h0_ref.shape[1]

    def body(t, h):
        xp = xp_ref[t]
        gh = jax.lax.dot_general(
            h, whht_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + bhh_ref[:]
        r = jax.nn.sigmoid(xp[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(xp[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(xp[:, 2 * H:] + r * gh[:, 2 * H:])
        h_new = (1.0 - z) * n + z * h
        ys_ref[t] = h_new
        return h_new

    h_last = jax.lax.fori_loop(0, T, body, h0_ref[:])
    hlast_ref[:] = h_last


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_sequence_fused(x_proj: jnp.ndarray, h0: jnp.ndarray,
                       w_hh: jnp.ndarray, b_hh: jnp.ndarray,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x_proj (T, B, 3H) = xs @ w_ih.T + b_ih; h0 (B, H); w_hh (3H, H).
    Returns (outputs (T, B, H), final hidden (B, H)), identical math to
    gesture2vec_tpu.models.gru.gru_layer."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, H3 = x_proj.shape
    H = H3 // 3
    ys, h_last = pl.pallas_call(
        _gru_seq_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj.astype(jnp.float32), h0.astype(jnp.float32),
      w_hh.T.astype(jnp.float32), b_hh[None, :].astype(jnp.float32))
    return ys, h_last


def supported(T: int, B: int, H: int) -> bool:
    """Everything must fit VMEM: x_proj + outputs + weights + carry."""
    vmem = 4 * (T * B * 3 * H + T * B * H + H * 3 * H + 2 * B * H + 3 * H)
    return vmem < 12 * 1024 * 1024

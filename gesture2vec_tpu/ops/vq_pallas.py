"""Pallas TPU kernel: fused VQ nearest-code search.

The VQ hot loop (ref: scripts/model/DAE_model.py:320-331 and every other
VQ layer) is: distances = |x|^2 + |e|^2 - 2 x e^T, then argmin over the
codebook. XLA materializes the (N, K) distance matrix in HBM between the
matmul and the reduction when N is large (corpus tokenization sweeps).
This kernel tiles N, keeps the codebook resident in VMEM across the
grid, and fuses matmul + bias + argmin so only (N,) indices and minima
ever leave the chip.

Numerical contract: distances are computed in fp32 on the MXU
(preferred_element_type) so the argmin - and therefore token identity -
matches the jnp reference implementation exactly.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

TILE_N = 256


def _vq_kernel(x_ref, cbt_ref, e2_ref, idx_ref, dmin_ref):
    """One N-tile: x (TILE_N, D), cbt (D, K), e2 (1, K)."""
    x = x_ref[:]
    # fp32 multi-pass matmul: token identity must match the jnp/XLA path
    # bit-for-bit, so no bf16 shortcut here
    xe = jax.lax.dot_general(
        x, cbt_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    d = x2 + e2_ref[:] - 2.0 * xe                    # (TILE_N, K)
    idx_ref[:] = jnp.argmin(d, axis=1, keepdims=True).astype(jnp.int32)
    dmin_ref[:] = jnp.min(d, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _vq_argmin_padded(x: jnp.ndarray, codebook: jnp.ndarray,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    k = codebook.shape[0]
    cbt = codebook.T                                  # (D, K)
    e2 = jnp.sum(codebook * codebook, axis=1)[None, :]  # (1, K)

    grid = (n // TILE_N,)
    idx, dmin = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, cbt, e2)
    return idx[:, 0], dmin[:, 0]


def vq_argmin(x: jnp.ndarray, codebook: jnp.ndarray,
              interpret: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, D) inputs, (K, D) codebook -> (indices (N,), min dist (N,)).

    Pads N to the tile size; inputs of any size work. Use
    supported(x, codebook) to decide between this and the jnp fallback.
    """
    n = x.shape[0]
    pad = (-n) % TILE_N
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    idx, dmin = _vq_argmin_padded(x.astype(jnp.float32),
                                  codebook.astype(jnp.float32),
                                  interpret=interpret)
    return idx[:n], dmin[:n]


def supported(x_shape: Tuple[int, int], cb_shape: Tuple[int, int]) -> bool:
    """VMEM budget check: codebook + one N-tile + distance tile."""
    d = x_shape[1]
    k = cb_shape[0]
    if d != cb_shape[1]:
        return False
    vmem = 4 * (d * k + TILE_N * d + 2 * TILE_N * k + k)
    return vmem < 12 * 1024 * 1024


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False

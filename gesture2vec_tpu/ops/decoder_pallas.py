"""Pallas TPU kernel: fully-fused autoregressive chunk decoder.

The Part-b decoder rollout (pre_linear -> BatchNorm -> ReLU -> 2-layer
GRU -> out_layer, ref: Autoencoder_VQVAE_model.py:499-592) is the
inference hot loop: T sequential steps whose per-step tensors are tiny,
so XLA's while-loop spends its time on loop overhead rather than math.
This kernel runs the ENTIRE rollout in one Pallas program: all weights,
the hidden state, and the output buffer stay resident in VMEM across
every step - zero HBM traffic between steps.

Inference-only (BatchNorm folded to scale/shift from running stats;
no dropout; no autodiff). Matmuls run at HIGHEST precision so outputs
match models/seq_ae.decode to float32 accuracy.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _decoder_kernel(x0_ref, h_ref, wpre_ref, bns_ref, bnb_ref,
                    w0ih_ref, w0hh_ref, b0ih_ref, b0hh_ref,
                    w1ih_ref, w1hh_ref, b1ih_ref, b1hh_ref,
                    wout_ref, bout_ref,
                    ys_ref, scratch_h):
    """One fused rollout. Shapes:
      x0 (B, D) seed frame; h (2, B, H) initial hidden;
      wpre (D, H); bn scale/bias (1, H) pre-folded with running stats;
      w{0,1}ih (H, 3H) transposed; w{0,1}hh (H, 3H) transposed;
      b* (1, 3H); wout (H, D); bout (1, D);
      ys (T, B, D) outputs; scratch_h (2, B, H).
    """
    H = scratch_h.shape[-1]
    T = ys_ref.shape[0]
    scratch_h[:] = h_ref[:]

    def gru_step(x, h, wih_ref, whh_ref, bih_ref, bhh_ref):
        gi = _dot(x, wih_ref[:]) + bih_ref[:]
        gh = _dot(h, whh_ref[:]) + bhh_ref[:]
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        return (1.0 - z) * n + z * h

    def body(t, x):
        # pre_linear + folded BatchNorm + ReLU
        p = _dot(x, wpre_ref[:]) * bns_ref[:] + bnb_ref[:]
        p = jnp.maximum(p, 0.0)
        h0 = gru_step(p, scratch_h[0], w0ih_ref, w0hh_ref, b0ih_ref,
                      b0hh_ref)
        scratch_h[0] = h0
        h1 = gru_step(h0, scratch_h[1], w1ih_ref, w1hh_ref, b1ih_ref,
                      b1hh_ref)
        scratch_h[1] = h1
        out = _dot(h1, wout_ref[:]) + bout_ref[:]
        ys_ref[t] = out
        return out

    jax.lax.fori_loop(0, T, body, x0_ref[:])


BLOCK = 256  # max chunks decoded per grid step (VMEM-bounded, see supported)


def _pick_block(B: int) -> int:
    """Per-grid-step chunk count: the smallest sublane-aligned (8-row)
    tile covering B, capped at BLOCK. B=1 serving then rolls out 8 rows
    per step instead of a fully padded 256 — the tunnel's dispatch floor
    hides the difference here, but on direct-attached chips the padded
    matmuls are pure waste."""
    return min(BLOCK, max(8, ((B + 7) // 8) * 8))


@functools.partial(jax.jit, static_argnames=("n_steps", "interpret"))
def fused_chunk_decode(x0: jnp.ndarray, h0: jnp.ndarray, params: dict,
                       batch_stats: dict, n_steps: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Run the Part-b decoder rollout fully fused.

    x0 (B, D) seed frames; h0 (2, B, H) decoder-initial hidden;
    params/batch_stats: the SeqVQAutoencoder 'decoder_step' subtree.
    Returns generated frames (n_steps, B, D) matching
    models/seq_ae.decode's post-seed outputs (eval mode, 2-layer GRU,
    no attention).

    Arbitrary B: the batch is tiled into BLOCK-chunk grid steps so VMEM
    residency is bounded regardless of workload size (a 30-minute
    transcript decodes ~1800 chunks; a single unblocked program
    overflows the 16 MB VMEM scoped allocation).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = x0.shape
    H = h0.shape[-1]
    # pad the chunk axis to a block multiple; padded rows are decoded
    # with zero seeds/hiddens and sliced away below
    block = _pick_block(B)
    n_blocks = max((B + block - 1) // block, 1)
    Bp = n_blocks * block
    if Bp != B:
        x0 = jnp.pad(x0, ((0, Bp - B), (0, 0)))
        h0 = jnp.pad(h0, ((0, 0), (0, Bp - B), (0, 0)))
    pre = params["pre_linear"]
    bn = params["pre_bn"]
    stats = batch_stats["pre_bn"]
    gru = params["gru"]
    out = params["out_layer"]

    # fold BatchNorm (eval): y = (x - mean) * scale/sqrt(var+eps) + bias
    inv = bn["scale"] / jnp.sqrt(stats["var"] + 1e-5)
    bn_scale = inv[None, :]
    bn_bias = (bn["bias"] - stats["mean"] * inv)[None, :]
    # fold the pre_linear bias into the BN bias
    bn_bias = bn_bias + pre["bias"][None, :] * bn_scale

    ins = [
        x0.astype(jnp.float32), h0.astype(jnp.float32),
        pre["kernel"].astype(jnp.float32),
        bn_scale.astype(jnp.float32), bn_bias.astype(jnp.float32),
        gru["l0_w_ih"].T.astype(jnp.float32),
        gru["l0_w_hh"].T.astype(jnp.float32),
        gru["l0_b_ih"][None, :].astype(jnp.float32),
        gru["l0_b_hh"][None, :].astype(jnp.float32),
        gru["l1_w_ih"].T.astype(jnp.float32),
        gru["l1_w_hh"].T.astype(jnp.float32),
        gru["l1_b_ih"][None, :].astype(jnp.float32),
        gru["l1_b_hh"][None, :].astype(jnp.float32),
        out["kernel"].astype(jnp.float32),
        out["bias"][None, :].astype(jnp.float32),
    ]
    # blocked specs: seeds/hiddens/outputs tile over the chunk axis,
    # weights are broadcast to every grid step
    bcast = [pl.BlockSpec(tuple(i.shape), lambda b: (0,) * i.ndim,
                          memory_space=pltpu.VMEM) for i in ins[2:]]
    ys = pl.pallas_call(
        _decoder_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((block, D), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, block, H), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)] + bcast,
        out_specs=pl.BlockSpec((n_steps, block, D), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, Bp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, block, H), jnp.float32)],
        interpret=interpret,
    )(*ins)
    return ys[:, :B] if Bp != B else ys


def supported(H: int, D: int, T: int, block: int = BLOCK) -> bool:
    """VMEM fit for ONE grid step (the chunk axis is tiled into `block`
    rows, so the answer no longer depends on the workload size)."""
    vmem = 4 * (block * D + 2 * block * H + D * H + 8 * H * 3 * H
                + H * D + T * block * D + 2 * block * H)
    return vmem < 12 * 1024 * 1024

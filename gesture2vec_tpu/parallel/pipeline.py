"""Pipeline parallelism (GPipe microbatching) over a "pp" mesh axis.

The reference is strictly single-GPU (SURVEY.md section 2.8), so like
the dp/tp rules in parallel/mesh.py this is a fresh TPU-native design
rather than a translation. The combinator implements the classic GPipe
schedule as SPMD code under jax.shard_map:

  - every device holds ONE stage's parameters (the stacked parameter
    pytree is row-sharded over the "pp" axis);
  - the batch is split into n_micro microbatches that stream through
    the stages; each tick every device applies its stage to its current
    buffer and passes the activation to its successor with ONE
    lax.ppermute — a point-to-point ICI hop, not an all-to-all;
  - the last stage's outputs are collected and re-replicated with a
    masked psum, so the result is bit-identical on every pp rank.

The schedule runs n_micro + n_stages - 1 ticks; the (n_stages - 1)
bubble ticks compute on garbage and are masked out, which is the
standard SPMD trade (uniform program, no host control flow). Reverse-
mode autodiff flows through the scan/ppermute/psum unchanged, so the
same combinator trains (grads arrive sharded exactly like the stacked
parameters — tests/test_pipeline_parallel.py pins forward AND gradient
identity against the sequential composition).

Stages must be shape-uniform (stage_fn : (params_i, x) -> y with
y.shape == x.shape). That fits this framework's natural pipeline
candidate — deep GRU stacks, where every layer above the input
projection maps (T, B, H) -> (T, B, H); `pipelined_gru_stack` wires
models/gru.gru_layer in as the stage body. The production models are
2-layer GRUs where pp has nothing to win on real workloads (dp x tp is
the production mesh; DESIGN.md discusses the trade), but the combinator
is how a deeper stack would scale past one chip's HBM. Expert
parallelism has no target anywhere in the reference model zoo (no MoE /
routed experts), so there is deliberately no "ep" axis.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def stack_stages(params_list: Sequence[Any]) -> Any:
    """Stack per-stage parameter pytrees along a new leading axis
    (the axis gpipe shards over "pp")."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *params_list)


def gpipe_fn(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
             mesh, n_micro: int, axis: str = "pp",
             batch_axis: str = "dp") -> Callable[[Any, jnp.ndarray],
                                                 jnp.ndarray]:
    """Build f(stacked_params, x) -> y running the GPipe schedule.

    stage_fn(params_i, x) must return an array of x's shape/dtype.
    stacked_params leaves carry a leading n_stages axis (stack_stages);
    x is (B, ...) with B % n_micro == 0. The returned f is jittable;
    under jit, XLA overlaps each tick's compute with the ppermute.
    """
    n_stages = int(mesh.shape[axis])
    dp = batch_axis in mesh.axis_names
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def worker(params, xs):
        # params leaves (1, ...): this device's stage. xs (n_micro,
        # mb_local, ...) is pp-invariant; only rank 0 consumes it.
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        idx = jax.lax.axis_index(axis)
        last = n_stages - 1

        def tick(carry, t):
            buf, outs = carry
            mb = jnp.clip(t, 0, n_micro - 1)
            x_in = jnp.where(idx == 0, xs[mb], buf)
            y = stage_fn(params, x_in)
            slot = jnp.clip(t - last, 0, n_micro - 1)
            write = jnp.logical_and(idx == last, t >= last)
            outs = outs.at[slot].set(jnp.where(write, y, outs[slot]))
            if perm:
                buf = jax.lax.ppermute(y, axis, perm)
            return (buf, outs), None

        # the carry becomes pp-varying after one tick; mark the zero
        # initials varying up front so scan's type check passes
        carry0 = jax.lax.pcast((jnp.zeros_like(xs[0]), jnp.zeros_like(xs)),
                               (axis,), to="varying")
        (_, outs), _ = jax.lax.scan(tick, carry0,
                                    jnp.arange(n_micro + last))
        # collect from the last stage and re-replicate across pp
        return jax.lax.psum(jnp.where(idx == last, outs, 0.0), axis)

    xspec = P(None, batch_axis) if dp else P(None)

    def f(stacked_params, x):
        b = x.shape[0]
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro "
                             f"{n_micro}")
        xs = x.reshape((n_micro, b // n_micro) + x.shape[1:])
        in_specs = (jax.tree_util.tree_map(lambda _: P(axis),
                                           stacked_params), xspec)
        y = jax.shard_map(worker, mesh=mesh, in_specs=in_specs,
                          out_specs=xspec)(stacked_params, xs)
        return y.reshape(x.shape)

    return f


def gpipe(stage_fn, stacked_params, x, *, mesh, n_micro: int,
          axis: str = "pp", batch_axis: str = "dp") -> jnp.ndarray:
    """One-shot convenience wrapper over gpipe_fn (eager; jit the
    gpipe_fn closure for production use)."""
    return gpipe_fn(stage_fn, mesh, n_micro, axis, batch_axis)(
        stacked_params, x)


def pipelined_gru_stack(xs_bm: jnp.ndarray, stacked_weights: Any, *,
                        mesh, n_micro: int, axis: str = "pp",
                        batch_axis: str = "dp") -> jnp.ndarray:
    """Deep uniform GRU stack with one layer per pipeline stage.

    xs_bm: (B, T, H) batch-major hidden-width sequences (the input
    projection to width H happens outside the pipeline, exactly like
    layer 0 of the production encoders). stacked_weights: dict with
    w_ih (S, 3H, H), w_hh (S, 3H, H), b_ih/b_hh (S, 3H). Returns the
    top layer's outputs, (B, T, H). Zero initial hidden per layer
    (torch.nn.GRU default, models/gru.gru_layer contract).
    """
    from gesture2vec_tpu.models.gru import gru_layer

    def stage(w, x):
        xs_tm = jnp.swapaxes(x, 0, 1)
        # derive the zero initial hidden from x (uniform stages: input
        # width == hidden width) so it inherits x's pp-varying vma type;
        # a fresh jnp.zeros would be pp-invariant and fail the inner
        # scan's carry type check under shard_map
        h0 = x[:, 0] * 0.0
        ys, _ = gru_layer(xs_tm, h0, w["w_ih"], w["w_hh"],
                          w["b_ih"], w["b_hh"])
        return jnp.swapaxes(ys, 0, 1)

    return gpipe(stage, stacked_weights, xs_bm, mesh=mesh,
                 n_micro=n_micro, axis=axis, batch_axis=batch_axis)

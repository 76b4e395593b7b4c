"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY.md section 2.8: no
DataParallel/DistributedDataParallel, no torch.distributed anywhere).
Scaling out is therefore a fresh TPU-native design:

  - "dp" axis: batch sharding. Gradients are averaged by jit's
    partitioner (psum over dp); the VQ-EMA statistics distribute exactly
    because they are batch sums (see models/vq.vq_ema axis_name).
  - "tp" axis: weight sharding for the wide, replicable tables - the VQ
    codebook rows and vocabulary embedding rows. Distances/logits are
    computed against the local shard; argmin/softmax run on the gathered
    (B, K) matrix, which XLA lowers to an all-gather over ICI of
    B x K_local scalars - tiny next to the matmul it avoids replicating.

Everything goes through jit + NamedSharding annotations; XLA inserts the
collectives (the scaling-book recipe). No hand-written NCCL-style code.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices=None) -> Optional[Mesh]:
    """shape like {"dp": 4} or {"dp": 4, "tp": 2}; None -> no mesh.

    Axis sizes must multiply to the device count used. With
    devices=None, uses all available devices.
    """
    if not shape:
        return None
    devices = np.asarray(devices if devices is not None else jax.devices())
    names = tuple(shape.keys())
    sizes = tuple(shape.values())
    total = int(np.prod(sizes))
    if devices.size < total:
        raise ValueError(f"mesh {shape} needs {total} devices, "
                         f"have {devices.size}")
    return Mesh(devices[:total].reshape(sizes), names)


# parameter-name substrings that shard over "tp" (row-sharded tables)
_TP_TABLE_KEYS = ("codebook", "embedding_table")


def param_spec(path: str, leaf, mesh: Mesh) -> P:
    """Sharding rule for one parameter, keyed by its flattened path."""
    if "tp" in mesh.axis_names:
        for key in _TP_TABLE_KEYS:
            if key in path and getattr(leaf, "ndim", 0) >= 2:
                return P("tp", *([None] * (leaf.ndim - 1)))
    return P()


def shard_params(params: Any, mesh: Optional[Mesh]) -> Any:
    """Place parameters: tables row-sharded over tp, rest replicated."""
    if mesh is None:
        return params
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat

    def place(pathleaf):
        path, leaf = pathleaf
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return jax.device_put(leaf,
                              NamedSharding(mesh, param_spec(name, leaf,
                                                             mesh)))

    placed = [place(pl) for pl in leaves]
    return jax.tree_util.tree_unflatten(treedef, placed)


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Shard the leading (batch) axis over dp; replicate if no mesh."""
    if mesh is None:
        return batch
    spec = P("dp") if "dp" in mesh.axis_names else P()

    def place(x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, batch)


def prepare_state(state, mesh_shape: Optional[Dict[str, int]]):
    """Build the mesh from a config mesh_shape and shard a NamedTuple
    train state over it: every field (params / optimizer state / EMA or
    batch stats) goes through shard_params, so row-shardable tables land
    on tp and everything else replicates. Returns (mesh, state);
    (None, state) when no mesh is configured.

    This is the one-line hook every trainer uses to honor
    cfg.mesh_shape (the rebuild's scale-out obligation, SURVEY.md §2.8 —
    the reference itself is strictly single-GPU)."""
    if not mesh_shape:
        return None, state
    mesh = make_mesh(mesh_shape)
    return mesh, type(state)(*(shard_params(f, mesh) for f in state))


def batch_placer(mesh: Optional[Mesh]):
    """Host->device placement fn for batches: dp-sharded under a mesh,
    plain asarray otherwise."""
    import jax.numpy as jnp
    if mesh is None:
        return jnp.asarray
    return lambda x: shard_batch(jnp.asarray(x), mesh)


def replicate(tree: Any, mesh: Optional[Mesh]) -> Any:
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding),
                                  tree)

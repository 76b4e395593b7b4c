"""Checkpoint save/load with the reference's payload semantics.

The reference saves {args, epoch, lang_model, pose_dim, gen_dict} via
torch.save and reloads through a string-keyed registry
load_checkpoint_and_model(path, device, what) that re-invokes each
training script's init_model (ref: scripts/utils/train_utils.py:98-175).
Here the payload is a msgpack-serialized pytree:

    {"args": <config dict>, "epoch": int, "pose_dim": int,
     "lang_model": <vocab state or None>, "kind": <registry kind str>,
     "params": <flax params>, "extra": {batch_stats, vq_state, ...}}

and the registry is a plain dict of builders - no circular imports.
Filename convention mirrors the reference:
"{name}_checkpoint_{epoch:03d}.bin" (ref: scripts/train.py:64).

Beyond the reference (which never saves optimizer state,
ref: utils/train_utils.py:98-113): trainers additionally store the
optax optimizer state and the threaded PRNG key in `extra` (config
save_optimizer, default on), so `resume_from` continues a run
BIT-EXACTLY - same Adam moments, same dropout stream - instead of the
reference's params-only warm restart.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
from flax import serialization

from gesture2vec_tpu.train.config import Config, load_config

_REGISTRY: Dict[str, Callable] = {}


def register_model_kind(what: str):
    """Decorator: register a builder(config, checkpoint_dict) ->
    (model, variables) for a checkpoint kind. Kinds mirror the
    reference's what= strings: DAE, autoencoder, autoencoder_vq,
    text2embedding, c2g, baseline, text2embedding_gan
    (ref: utils/train_utils.py:116-175)."""

    def deco(fn):
        _REGISTRY[what] = fn
        return fn

    return deco


def _to_serializable(tree):
    if isinstance(tree, dict):
        return {k: _to_serializable(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_serializable(v) for v in tree]
    if hasattr(tree, "dtype"):
        return np.asarray(tree)
    return tree


def resume_extra(state, rng, config: Config) -> Dict[str, Any]:
    """The exact-resume payload: optimizer state (as a plain state dict)
    + the current PRNG key. Empty when config.save_optimizer is off."""
    if not config.save_optimizer:
        return {}
    return {"opt_state": serialization.to_state_dict(state.opt_state),
            "rng": np.asarray(rng)}


def restore_resume_extra(state, rng, extra: Dict[str, Any]):
    """Inverse of resume_extra: returns (state, rng) with the optimizer
    state and PRNG key restored when the checkpoint carries them (older
    or save_optimizer=false checkpoints fall back to a fresh optimizer,
    the reference's own resume semantics)."""
    import jax.numpy as jnp

    if extra.get("opt_state") is not None:
        state = state._replace(opt_state=serialization.from_state_dict(
            state.opt_state, extra["opt_state"]))
    if extra.get("rng") is not None:
        rng = jnp.asarray(np.asarray(extra["rng"], dtype=np.uint32))
    return state, rng


def restore_for_resume(state, rng, path: str):
    """The trainer resume preamble shared by every part: load the
    checkpoint, swap in params/batch_stats, restore the optimizer state
    and PRNG key when present (bit-exact resume), and report the start
    epoch. Returns (state, rng, start_epoch, payload) — trainers with
    extra restorable fields (e.g. Part a's vq_state) layer them on from
    the returned payload."""
    import logging

    payload = load_checkpoint(path)
    state = state._replace(
        params=payload["params"],
        batch_stats=payload["extra"].get("batch_stats", {}))
    state, rng = restore_resume_extra(state, rng, payload["extra"])
    start_epoch = int(payload["epoch"])
    logging.info("resumed from %s at epoch %d", path, start_epoch)
    return state, rng, start_epoch, payload


def save_checkpoint(path: str, *, config: Config, epoch: int,
                    params: Any, pose_dim: int = 0,
                    lang_model: Optional[dict] = None,
                    extra: Optional[Dict[str, Any]] = None,
                    kind: str = "") -> None:
    # Footgun guard: two parts trained with the same config name + save
    # dir produce colliding "{name}_checkpoint_{epoch}.bin" filenames
    # (the reference has the same hazard, ref: scripts/train.py:64).
    # Overwriting a checkpoint of a DIFFERENT kind is almost certainly
    # that collision, not a re-run - warn loudly.
    if kind and os.path.exists(path):
        try:
            old_kind = load_checkpoint(path).get("kind", "")
        except Exception:
            old_kind = ""
        if old_kind and old_kind != kind:
            import logging
            logging.warning(
                "overwriting %s: existing checkpoint is kind=%r, new "
                "one is kind=%r - are two pipeline parts sharing a "
                "config name/save dir? Use distinct names or "
                "--save-dir.", path, old_kind, kind)
    payload = {
        "args": config.to_dict(),
        "epoch": int(epoch),
        "pose_dim": int(pose_dim),
        "lang_model": lang_model,
        "kind": kind,
        "params": _to_serializable(params),
        "extra": _to_serializable(extra or {}),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    extras = payload["args"].pop("extras", {}) or {}
    payload["config"] = load_config({**payload["args"], **extras})
    return payload


def _ensure_registry() -> None:
    """Builders live in the trainer modules; import them on demand so the
    registry is populated regardless of which module loaded first."""
    import importlib
    for mod in ("dae_trainer", "seq_ae_trainer", "text2token_trainer",
                "misc_trainers", "gan_trainer", "audio2token_trainer"):
        try:
            importlib.import_module(f"gesture2vec_tpu.train.{mod}")
        except ImportError:
            pass


def load_checkpoint_and_model(path: str, what: str
                              ) -> Tuple[Any, Any, Dict[str, Any]]:
    """Returns (model, variables, checkpoint_payload). `what` selects the
    registered builder, mirroring the reference's registry keys."""
    _ensure_registry()
    payload = load_checkpoint(path)
    if what not in _REGISTRY:
        raise KeyError(f"unknown checkpoint kind {what!r}; known: "
                       f"{sorted(_REGISTRY)}")
    stored = payload.get("kind", "")
    # autoencoder / autoencoder_vq share a builder (config decides)
    alias = {"autoencoder": "autoencoder_vq"}
    if stored and alias.get(stored, stored) != alias.get(what, what):
        import logging
        logging.warning("%s was saved as kind=%r but is being loaded as "
                        "%r - wrong checkpoint passed?", path, stored,
                        what)
    model, variables = _REGISTRY[what](payload["config"], payload)
    return model, variables, payload


def checkpoint_filename(save_dir: str, name: str,
                        epoch: "int | str") -> str:
    """Numbered checkpoint path, or a tagged one (e.g. "best") when
    `epoch` is a string — keep_best snapshots save under the distinct
    "{name}_checkpoint_best.bin" so a numbered final-epoch file never
    shadows them (round-4 advisor finding)."""
    tag = f"{epoch:03d}" if isinstance(epoch, int) else str(epoch)
    return os.path.join(save_dir, f"{name}_checkpoint_{tag}.bin")


def latest_checkpoint(ckpt_dir: str, pattern: str = "*.bin"
                      ) -> Optional[str]:
    """The checkpoint a reuse path should load from `ckpt_dir`: the
    keep_best snapshot ("*_checkpoint_best.bin") when one exists,
    otherwise the highest-epoch file. Returns None when the dir has no
    matching checkpoints. Every benchmark/CLI reuse path should go
    through this instead of sorted(glob)[-1], which silently picks the
    (possibly overfit) final epoch over a keep_best snapshot."""
    import glob as _glob
    paths = sorted(_glob.glob(os.path.join(ckpt_dir, pattern)))
    if not paths:
        return None
    best = [p for p in paths if p.endswith("_checkpoint_best.bin")]
    return best[-1] if best else paths[-1]

"""Import the LITERAL reference model modules from /root/reference.

The reference's model package is importable as-is with torch except for
two unavailable imports that are stubbed here:
  - configargparse: the models only do `from configargparse import
    argparse` (ref: Autoencoder_VQVAE_model.py:25), so the stub exposes
    the stdlib argparse under that name;
  - fasttext: model/vocab.py imports it at module level; it is never
    called by the model classes, so the stub raises if touched.

These literal classes are the source of truth for the parity tests
(BASELINE.md: >= 99% VQ token agreement vs the PyTorch reference) -
they are the reference's own forward code, not rebuilt twins.
"""
from __future__ import annotations

import contextlib
import importlib
import os
import sys
import types

REF_SCRIPTS = "/root/reference/scripts"

_REF_MODULES = ("DAE_model", "Autoencoder_VQVAE_model",
                "text2embedding_model", "Helper_models", "tcn")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF_SCRIPTS, "model"))


def load_reference_models() -> dict:
    """Import and return {name: module} for the literal reference model
    modules. The reference scripts dir is only on sys.path during the
    import so its top-level packages (utils, ...) cannot shadow ours."""
    if "configargparse" not in sys.modules:
        stub = types.ModuleType("configargparse")
        import argparse
        stub.argparse = argparse
        sys.modules["configargparse"] = stub
    if "fasttext" not in sys.modules:
        ft = types.ModuleType("fasttext")

        def _unavailable(*_a, **_k):
            raise RuntimeError("fasttext stub (tests): not available")

        ft.load_model = _unavailable
        sys.modules["fasttext"] = ft
    added = REF_SCRIPTS not in sys.path
    if added:
        sys.path.insert(0, REF_SCRIPTS)
    try:
        return {name: importlib.import_module(f"model.{name}")
                for name in _REF_MODULES}
    finally:
        if added:
            sys.path.remove(REF_SCRIPTS)


def load_reference_module(name: str):
    """Import one additional literal reference model module (e.g.
    'seq2seq_net') with the same stubbing/path discipline as
    load_reference_models."""
    load_reference_models()  # install stubs once
    added = REF_SCRIPTS not in sys.path
    if added:
        sys.path.insert(0, REF_SCRIPTS)
    try:
        return importlib.import_module(f"model.{name}")
    finally:
        if added:
            sys.path.remove(REF_SCRIPTS)


@contextlib.contextmanager
def inline_step_dropout_disabled():
    """Make the reference seq-AE decoder deterministic for trajectory
    comparison.

    The reference constructs `nn.Dropout(0.95)` INLINE at every decoder
    step (ref: Autoencoder_VQVAE_model.py:570); a freshly constructed
    module is in training mode, so this dropout fires even under
    model.eval(). Replacing the Dropout *constructor* for the duration
    of a forward call turns only these inline constructions into
    Identity - dropout modules built at model init are instances
    already and keep their (eval-disabled) behavior.
    """
    import torch.nn as tnn
    orig = tnn.Dropout
    tnn.Dropout = lambda *_a, **_k: tnn.Identity()
    try:
        yield
    finally:
        tnn.Dropout = orig

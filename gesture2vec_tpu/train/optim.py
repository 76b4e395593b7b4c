"""Optimizer construction shared by all parts.

Every reference trainer uses Adam(lr, betas=(0.5, 0.999)) with global
grad-norm clipping at 5
(ref: scripts/train.py:49, scripts/train_eval/train_seq2seq.py:130,235,743).
"""
from __future__ import annotations

import optax


def make_optimizer(learning_rate: float, clip_norm: float = 5.0,
                   b1: float = 0.5, b2: float = 0.999
                   ) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adam(learning_rate, b1=b1, b2=b2),
    )

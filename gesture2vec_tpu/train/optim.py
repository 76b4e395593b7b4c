"""Optimizer construction shared by all parts.

Every reference trainer but the GAN uses Adam(lr, betas=(0.5, 0.999))
with global grad-norm clipping at 5
(ref: scripts/train.py:49, scripts/train_eval/train_seq2seq.py:130,235,743).
The GAN trainer leaves clipping commented out
(train_seq2seq.py:646-648 "Todo: is it necessary") - pass
clip_norm=None to match it.
"""
from __future__ import annotations

from typing import Optional

import optax


def make_optimizer(learning_rate: float, clip_norm: Optional[float] = 5.0,
                   b1: float = 0.5, b2: float = 0.999
                   ) -> optax.GradientTransformation:
    adam = optax.adam(learning_rate, b1=b1, b2=b2)
    if clip_norm is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(clip_norm), adam)

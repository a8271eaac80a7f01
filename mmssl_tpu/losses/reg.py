"""Modality-feature L2 regularizer.

Contract: ``feat_reg_loss_calculation`` (``MMSSL/main.py:252-257``): half the
squared norms of the propagated modality user/item embeddings, divided by
n_items, times feat_reg_decay.  Generalized to N modalities (the reference
hardcodes image+text; with 2 modalities this reduces exactly to it).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def feat_reg_loss(
    embeds: Sequence[jnp.ndarray],
    n_items: int,
    feat_reg_decay: float,
) -> jnp.ndarray:
    total = jnp.zeros(())
    for e in embeds:
        total = total + 0.5 * jnp.sum(e**2)
    return feat_reg_decay * total / n_items

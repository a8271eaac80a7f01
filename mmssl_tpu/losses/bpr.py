"""Bayesian Personalized Ranking loss.

Contract: ``Trainer.bpr_loss`` (``MMSSL/main.py:499-511``, byte-identical in
LATTICE/codes/main.py:164-176 and MICRO/codes/main.py:168-180):

  mf_loss  = -mean(logsigmoid(<u, i+> - <u, i->))
  emb_loss = decay * (||u||^2 + ||i+||^2 + ||i-||^2) / (2 * batch_size)

Quirk Q11: the regularizer divides by batch_size (not 2B or 3B) and covers
only the gathered rows; ``reg_loss`` is always 0.  Both reproduced.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bpr_loss(
    u_emb: jnp.ndarray,  # [B, d] gathered user rows
    pos_emb: jnp.ndarray,  # [B, d]
    neg_emb: jnp.ndarray,  # [B, d]
    decay: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mf_loss, emb_loss, reg_loss) as in the reference."""
    batch_size = u_emb.shape[0]
    pos_scores = jnp.sum(u_emb * pos_emb, axis=1)
    neg_scores = jnp.sum(u_emb * neg_emb, axis=1)
    mf_loss = -jnp.mean(jax.nn.log_sigmoid(pos_scores - neg_scores))
    regularizer = 0.5 * (
        jnp.sum(u_emb**2) + jnp.sum(pos_emb**2) + jnp.sum(neg_emb**2)
    )
    emb_loss = decay * regularizer / batch_size
    return mf_loss, emb_loss, jnp.zeros(())

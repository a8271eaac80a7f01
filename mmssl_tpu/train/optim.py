"""Optimizers and schedules.

Contract (``MMSSL/main.py:74-87``, C26 in SURVEY.md):
  - MMSSL generator: torch AdamW(lr=5.5e-4) with the torch-default
    weight_decay=1e-2 -> optax.adamw same defaults.
  - MMSSL discriminator: Adam(lr=3e-4, betas=(0.5, 0.9)).
  - Quirk Q6: MMSSL's LambdaLR is constructed but never stepped -> both run
    at constant LR (the default here; disable via parity.mmssl_constant_lr).
  - LATTICE/MICRO: Adam(lr) with LambdaLR 0.96 ** (epoch / 50) stepped once
    per epoch (LATTICE/codes/main.py:105) -> implemented as a step-count
    schedule with static steps_per_epoch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def lambda_lr_schedule(base_lr: float, decay_base: float, decay_interval: float, steps_per_epoch: int):
    """lr(step) = base * decay_base ** (epoch / interval), epoch stepped once
    per epoch like torch LambdaLR."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * decay_base ** (epoch / decay_interval)

    return schedule


def make_generator_optimizer(lr: float, constant_lr: bool = True, steps_per_epoch: int = 1,
                             decay_base: float = 0.96, decay_interval: float = 50.0) -> optax.GradientTransformation:
    """MMSSL generator AdamW (torch defaults: b1=0.9 b2=0.999 eps=1e-8 wd=1e-2)."""
    if constant_lr:
        sched = lr
    else:
        sched = lambda_lr_schedule(lr, decay_base, decay_interval, steps_per_epoch)
    return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)


def scale_by_adam_moments(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, moment_dtype=None
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moments stored at ``moment_dtype``.

    The update math always runs in f32 (stored moments are cast up, the new
    moments cast back down for storage), so ``moment_dtype=None`` matches
    optax.scale_by_adam; ``jnp.bfloat16`` halves the optimizer-state HBM
    traffic of the update fusion — at Amazon-Baby scale the discriminator's
    [n_items, n_items/4] layer makes that fusion the single most expensive op
    of the train step (0.85 ms, ~7% of it; see scripts/profile_step.py), and
    optax only exposes ``mu_dtype``.  bf16 second moments carry ~3 decimal
    digits; for the WGAN discriminator (bounded [0,100] outputs, Q8) the
    resulting <0.5% relative jitter on the per-parameter step size is far
    below the noise injected by the Gumbel softening of its inputs.
    """

    def _store(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
        return x.astype(moment_dtype) if moment_dtype is not None else x.astype(like.dtype)

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype or p.dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count_inc = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count_inc.astype(jnp.float32)

        mu_f = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1.0 - b1) * g.astype(jnp.float32),
            updates, state.mu,
        )
        nu_f = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu,
        )
        out = jax.tree.map(lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu_f, nu_f)
        new_state = optax.ScaleByAdamState(
            count=count_inc,
            mu=jax.tree.map(_store, mu_f, state.mu),
            nu=jax.tree.map(_store, nu_f, state.nu),
        )
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_discriminator_optimizer(
    lr: float, betas=(0.5, 0.9), moment_dtype: str = "float32"
) -> optax.GradientTransformation:
    if moment_dtype in ("float32", "f32", ""):
        return optax.adam(lr, b1=betas[0], b2=betas[1], eps=1e-8)
    mdt = jnp.dtype(moment_dtype)

    def _cast_grads(updates, state, params=None):
        # Round the incoming gradients to the moment dtype BEFORE the Adam
        # fusion: XLA sinks the convert into the gradient-producing fusion's
        # epilogue, so the [n_items, n_items/4] gradient materializes at half
        # the bytes and the update fusion (the step's single biggest op)
        # reads half as much.  Numerically subsumed by bf16 moments: the
        # gradient only feeds m/v (already rounded to mdt for storage).
        del params
        return jax.tree.map(lambda g: g.astype(mdt), updates), state

    return optax.chain(
        optax.GradientTransformation(lambda params: optax.EmptyState(), _cast_grads),
        scale_by_adam_moments(b1=betas[0], b2=betas[1], eps=1e-8, moment_dtype=mdt),
        optax.scale(-lr),
    )


def make_simple_optimizer(lr: float, steps_per_epoch: int,
                          decay_base: float = 0.96, decay_interval: float = 50.0) -> optax.GradientTransformation:
    """LATTICE/MICRO/CF Adam with per-epoch LambdaLR decay."""
    sched = lambda_lr_schedule(lr, decay_base, decay_interval, steps_per_epoch)
    return optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)

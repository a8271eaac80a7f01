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


def make_discriminator_optimizer(lr: float, betas=(0.5, 0.9)) -> optax.GradientTransformation:
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=1e-8)


def make_simple_optimizer(lr: float, steps_per_epoch: int,
                          decay_base: float = 0.96, decay_interval: float = 50.0) -> optax.GradientTransformation:
    """LATTICE/MICRO/CF Adam with per-epoch LambdaLR decay."""
    sched = lambda_lr_schedule(lr, decay_base, decay_interval, steps_per_epoch)
    return optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)

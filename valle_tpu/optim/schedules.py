"""LR schedules: Eden, Noam, cosine (+ factory).

Capability parity with reference ``valle/modules/optim.py:664-832`` (Eden)
and ``valle/modules/scheduler.py`` (NoamScheduler, get_scheduler). These are
plain functions of (batch, epoch) — the trainer computes the lr each step
and injects it into the optimizer via ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import math


def eden_lr(base_lr: float, batch, epoch, *, lr_batches: float = 5000.0,
            lr_epochs: float = 4.0, warmup_batches: float = 500.0):
    """Eden (reference optim.py:759-807):

    lr = base_lr * ((batch^2+B^2)/B^2)^-0.25 * ((epoch^2+E^2)/E^2)^-0.25
         * warmup,   warmup: 0.5 -> 1 linearly over warmup_batches.
    Works on Python numbers and jnp scalars alike.
    """
    import jax.numpy as jnp

    batch = jnp.asarray(batch, jnp.float32)
    epoch = jnp.asarray(epoch, jnp.float32)
    factor = (((batch ** 2 + lr_batches ** 2) / lr_batches ** 2) ** -0.25
              * ((epoch ** 2 + lr_epochs ** 2) / lr_epochs ** 2) ** -0.25)
    warmup = jnp.where(batch >= warmup_batches, 1.0,
                       0.5 + 0.5 * batch / warmup_batches)
    return base_lr * factor * warmup


def noam_lr(base_lr: float, step, *, dim_embed: int, warmup_steps: int):
    """Noam (reference scheduler.py:24-27); step is 1-based."""
    import jax.numpy as jnp

    step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
    return base_lr * dim_embed ** -0.5 * jnp.minimum(
        step ** -0.5, step * warmup_steps ** -1.5)


def cosine_lr(base_lr: float, step, *, total_steps: int, eta_min: float = 0.0):
    import jax.numpy as jnp

    step = jnp.minimum(jnp.asarray(step, jnp.float32), total_steps)
    return eta_min + 0.5 * (base_lr - eta_min) * (
        1 + jnp.cos(math.pi * step / total_steps))


def get_lr_fn(params):
    """Factory mirroring reference ``get_scheduler`` (scheduler.py:58-78).

    Returns ``lr(batch_idx, epoch) -> lr`` for the configured scheduler.
    """
    name = params.scheduler_name.lower()
    if name == "eden":
        return lambda batch, epoch: eden_lr(
            params.base_lr, batch, epoch, lr_batches=5000.0, lr_epochs=4.0,
            warmup_batches=params.warmup_steps)
    if name == "noam":
        return lambda batch, epoch: noam_lr(
            params.base_lr, batch, dim_embed=params.decoder_dim,
            warmup_steps=params.warmup_steps)
    if name == "cosine":
        return lambda batch, epoch: cosine_lr(
            params.base_lr, batch, total_steps=params.warmup_steps)
    raise NotImplementedError(params.scheduler_name)

"""Optimizer + LR schedule construction.

Rebuild of /root/reference/train.py:55-128 on optax:
* AdamW / Adam / SGD with the reference's decay/no-decay split (biases and
  norm scales excluded from weight decay, train.py:60-78);
* linear warmup from warmup_lr over warmup_epochs, then multiplicative
  step decay (gamma at each milestone epoch), stepped PER ITERATION like
  the reference's per-iteration scheduler.step() (train.py:187).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(base_lr: float, warmup_lr: float, warmup_steps: int,
                     milestones_steps: Tuple[int, ...], gamma: float
                     ) -> optax.Schedule:
    """Linear warmup -> piecewise constant decay.

    Matches the reference LambdaLR: lr(t) = warmup + (base-warmup)*t/T for
    t < T, then base * gamma^{#milestones passed} (train.py:100-128).
    """
    milestones = tuple(int(m) for m in milestones_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        lr = warmup_lr + (base_lr - warmup_lr) * w
        decay = jnp.ones(())
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return jnp.where(step < warmup_steps, lr, base_lr * decay)

    return schedule


def weight_decay_mask(params) -> Any:
    """True for parameters that should receive weight decay: conv/dense
    kernels only — biases, norm scales, and learned scalars (fusion weight,
    RPE tables) excluded, matching the reference's no-decay group
    (train.py:60-78 excludes names with 'bias'/'bn'/'norm')."""

    def decide(path, value):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        return name == "kernel" and value.ndim >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


def build_optimizer(cfg, steps_per_epoch: int
                    ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Build (optimizer, schedule) from a Config (ref train.py:55-128)."""
    t = cfg.train
    schedule = make_lr_schedule(
        base_lr=t.lr,
        warmup_lr=t.warmup_lr,
        warmup_steps=t.warmup_epochs * steps_per_epoch,
        milestones_steps=tuple(m * steps_per_epoch for m in t.lr_milestones),
        gamma=t.lr_gamma,
    )

    name = t.optimizer.lower()
    if name == "adamw":
        tx = optax.adamw(schedule, b1=t.betas[0], b2=t.betas[1],
                         weight_decay=t.weight_decay,
                         mask=weight_decay_mask)
    elif name == "adam":
        tx = optax.adam(schedule, b1=t.betas[0], b2=t.betas[1])
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(t.weight_decay, mask=weight_decay_mask),
            optax.sgd(schedule, momentum=t.momentum, nesterov=True),
        )
    else:
        raise ValueError(f"Unknown optimizer {t.optimizer!r}")

    if t.grad_clip_norm and t.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(t.grad_clip_norm), tx)
    return tx, schedule

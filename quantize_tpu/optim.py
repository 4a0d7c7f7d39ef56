"""Optimizers and LR schedules (optax).

Covers the reference's optim layer surface (``optim/optimizer.py:23-80``,
``optim/lr_scheduler.py:18-215``): optimizers adam/adamw/sgd/rmsprop and
schedulers step/multistep/exponential/cosine plus the custom
cosine-with-warmup, linear-warmup and constant schedules — expressed as optax
schedules (a function of the *step*, converted from the reference's
per-epoch semantics by the runner via ``steps_per_epoch``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import optax

from .utils.registry import Registry

OPTIMIZERS = Registry("optimizers")
SCHEDULERS = Registry("lr schedulers")


def _get(cfg: Any, key: str, default=None):
    v = getattr(cfg, key, None) if cfg is not None else None
    return default if v is None else v


# ---------------------------------------------------------------------------
# schedules: functions step -> lr multiplier-applied learning rate
# ---------------------------------------------------------------------------

@SCHEDULERS.register(name="constant")
def constant(lr: float, steps_per_epoch: int, cfg=None):
    return optax.constant_schedule(lr)


@SCHEDULERS.register(name="step")
def step(lr: float, steps_per_epoch: int, cfg=None):
    step_size = _get(cfg, "step_size", 30) * steps_per_epoch
    gamma = _get(cfg, "gamma", 0.1)
    return lambda t: lr * gamma ** (t // step_size)


@SCHEDULERS.register(name="multistep")
def multistep(lr: float, steps_per_epoch: int, cfg=None):
    milestones: Sequence[int] = _get(cfg, "milestones", [30, 60])
    gamma = _get(cfg, "gamma", 0.1)
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


@SCHEDULERS.register(name="exponential")
def exponential(lr: float, steps_per_epoch: int, cfg=None):
    gamma = _get(cfg, "gamma", 0.9)
    return optax.exponential_decay(lr, steps_per_epoch, gamma)


@SCHEDULERS.register(name="cosine")
def cosine(lr: float, steps_per_epoch: int, cfg=None):
    total = _get(cfg, "t_max", _get(cfg, "max_epoch", 100)) * steps_per_epoch
    return optax.cosine_decay_schedule(lr, max(total, 1))


@SCHEDULERS.register(name="cosine_warmup")
def cosine_warmup(lr: float, steps_per_epoch: int, cfg=None):
    warmup_epochs = _get(cfg, "warmup_epoch", 5)
    total = _get(cfg, "max_epoch", 100) * steps_per_epoch
    warmup = max(int(warmup_epochs * steps_per_epoch), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=_get(cfg, "warmup_lr", 0.0),
        peak_value=lr,
        warmup_steps=warmup,
        decay_steps=max(total, warmup + 1),
    )


@SCHEDULERS.register(name="linear_warmup")
def linear_warmup(lr: float, steps_per_epoch: int, cfg=None):
    warmup_epochs = _get(cfg, "warmup_epoch", 5)
    warmup = max(int(warmup_epochs * steps_per_epoch), 1)
    return optax.join_schedules(
        [optax.linear_schedule(_get(cfg, "warmup_lr", 0.0), lr, warmup),
         optax.constant_schedule(lr)],
        [warmup],
    )


def build_lr_scheduler(cfg: Any, steps_per_epoch: int = 1):
    """Build an optax schedule from ``cfg.lr_scheduler`` + ``cfg.optimizer.lr``."""
    sched_cfg = getattr(cfg, "lr_scheduler", None)
    lr = float(_get(getattr(cfg, "optimizer", None), "lr", 1e-3))
    name = _get(sched_cfg, "name", "constant")
    # merge train cfg for max_epoch defaults
    class _Merged:
        def __getattr__(self, k):
            for node in (sched_cfg, getattr(cfg, "train", None)):
                v = getattr(node, k, None) if node is not None else None
                if v is not None:
                    return v
            return None

    return SCHEDULERS.build(name, lr, steps_per_epoch, _Merged())


# ---------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------

@OPTIMIZERS.register(name="adam")
def adam(schedule, cfg=None):
    return optax.adam(
        schedule,
        b1=_get(cfg, "beta1", 0.9), b2=_get(cfg, "beta2", 0.999),
        eps=_get(cfg, "eps", 1e-8),
    )


@OPTIMIZERS.register(name="adamw")
def adamw(schedule, cfg=None):
    return optax.adamw(
        schedule,
        b1=_get(cfg, "beta1", 0.9), b2=_get(cfg, "beta2", 0.999),
        eps=_get(cfg, "eps", 1e-8),
        weight_decay=_get(cfg, "weight_decay", 1e-2),
    )


@OPTIMIZERS.register(name="sgd")
def sgd(schedule, cfg=None):
    # momentum defaults to 0 like the reference (optim/optimizer.py:49-55
    # passes `optim.momentum or 0` to torch.optim.SGD) — a config written
    # for the reference must mean the same optimizer here
    momentum = _get(cfg, "momentum", 0.0)
    wd = _get(cfg, "weight_decay", 0.0)
    tx = optax.sgd(schedule, momentum=momentum or None,
                   nesterov=bool(_get(cfg, "nesterov", False)))
    if wd:
        tx = optax.chain(optax.add_decayed_weights(wd), tx)
    return tx


@OPTIMIZERS.register(name="rmsprop")
def rmsprop(schedule, cfg=None):
    return optax.rmsprop(
        schedule,
        decay=_get(cfg, "alpha", 0.99),
        eps=_get(cfg, "eps", 1e-8),
        momentum=_get(cfg, "momentum", 0.0),
    )


def build_optimizer(cfg: Any, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Build an optax optimizer from ``cfg.optimizer`` (+ scheduler)."""
    opt_cfg = getattr(cfg, "optimizer", None)
    name = _get(opt_cfg, "name", "adam")
    schedule = build_lr_scheduler(cfg, steps_per_epoch)
    return OPTIMIZERS.build(name, schedule, opt_cfg)

"""AdaRound: learnable rounding offsets (arXiv:2004.10568).

Pure-function equivalents of the reference's AdaRound module
(``modelzoo/modules/range/adaround.py:11-109``):

* ``rect_sigmoid``  — h(V) = clip(sigmoid(V)(ζ−γ)+γ, 0, 1)
* ``init_v``        — inverse of h at the fractional part of x/scale − zero
* ``regularization``— Σ(1 − |2h−1|^β), annealed by β
* ``adaround_round``— floor(v) + h(V) with round-pass-through STE

plus the β schedule of the AdaRound runner (``runner/adaround.py:103-119``).
The ``V`` tensor lives in a dedicated flax collection and is the only
trainable leaf during AdaRound optimization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .fakequant import ste_floor_plus

GAMMA = -0.1
ZETA = 1.1


def rect_sigmoid(v: jnp.ndarray, gamma: float = GAMMA, zeta: float = ZETA) -> jnp.ndarray:
    return jnp.clip(jax.nn.sigmoid(v) * (zeta - gamma) + gamma, 0.0, 1.0)


def init_v(x_over_scale: jnp.ndarray, gamma: float = GAMMA, zeta: float = ZETA) -> jnp.ndarray:
    """Initialize V so that h(V) equals the fractional part of the input."""
    frac = x_over_scale - jnp.floor(x_over_scale)
    frac = jnp.clip(frac, gamma + 1e-6, zeta - 1e-6)
    return -jnp.log((zeta - gamma) / (frac - gamma) - 1.0)


def regularization(
    v: jnp.ndarray, beta: float, gamma: float = GAMMA, zeta: float = ZETA,
    reduction: str = "mean",
) -> jnp.ndarray:
    h = rect_sigmoid(v, gamma, zeta)
    reg = 1.0 - jnp.abs(2.0 * h - 1.0) ** beta
    if reduction == "mean":
        return jnp.mean(reg)
    if reduction == "sum":
        return jnp.sum(reg)
    return reg


def adaround_round(
    x_over_scale: jnp.ndarray, v: jnp.ndarray, gamma: float = GAMMA, zeta: float = ZETA
) -> jnp.ndarray:
    """floor + h(V) rounding with straight-through hard rounding."""
    return ste_floor_plus(x_over_scale, rect_sigmoid(v, gamma, zeta))


def beta_schedule(
    current: jnp.ndarray | float,
    total: float,
    start: float = 20.0,
    end: float = 2.0,
    warmup: float = 0.2,
) -> jnp.ndarray:
    """Linearly decay β from ``start`` to ``end`` after a warmup fraction."""
    t = jnp.asarray(current, jnp.float32) / total
    decayed = start + (end - start) * (t - warmup) / (1.0 - warmup)
    return jnp.where(t < warmup, start, decayed)

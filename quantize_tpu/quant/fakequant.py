"""Fake-quantization primitives with straight-through gradients.

The reference implements STE as a torch ``autograd.Function`` with handwritten
gradients (``modelzoo/modules/quantizer.py:15-40``):

    forward:  round(x/scale - zero)
    backward: dx = g/scale,  dscale = -g·x/scale²,  dzero = -g

Those are exactly the gradients of the *unrounded* expression
``v = x/scale - zero``, so on TPU we express rounding as
``v + stop_gradient(round(v) - v)`` and let autodiff produce identical
gradients — no custom VJP needed for the core path.

The clamp is NOT ``jnp.clip``: at an input exactly equal to qmin/qmax —
which every minmax-calibrated channel's extreme element hits by
construction — ``jnp.clip``'s min/max tie-breaking passes gradient 0.5
while torch ``clamp`` passes 1.0. Through the dequant product rule that
half-gradient turns into a spurious ``qmax/2``-sized scale-gradient term on
the extreme element (the round-path ``-x/scale²`` no longer cancels the
``+q`` term), which round 5's QAT golden-trajectory tier caught as 10-100x
too-large scale grads on affected channels. ``ste_clamp`` below uses
``where`` with strict inequalities so the boundary passes full gradient,
exactly like torch ``clamp`` (``runner`` composition pinned by
``tests/test_golden_traj.py``; unit-pinned in ``tests/test_fakequant.py``).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .qspec import QuantSpec, broadcast_to_axis


_SIM_DTYPE = None  # None = compute fake-quant in the input dtype (f32)


def set_quant_sim_dtype(dtype) -> None:
    """Select the fake-quant arithmetic dtype for simulation/QAT forwards.

    ``'bfloat16'`` runs the divide/round/clamp/dequant chain in bf16
    (halving the VPU/HBM element width of the quantization passes that
    dominate the QAT step's overhead — ``docs/BENCH_NOTES.md`` round 4).
    Integer grids up to 8 bits are exact in bf16 (integers <= 256); the
    ``x/scale`` quotient carries bf16's ~0.4% relative error, so rounding
    decisions near grid midpoints can flip vs f32 — an accuracy/speed
    trade measured in the round-5 QAT A/B. ``None``/``'float32'`` restores
    exact f32 (the default; golden-trajectory parity is pinned in f32).
    Packed/deploy quantization (``quantize_int``) is NOT affected."""
    global _SIM_DTYPE
    _SIM_DTYPE = (None if dtype in (None, "float32", "f32")
                  else jnp.dtype(dtype))


def quant_sim_dtype():
    return _SIM_DTYPE


def ste_round(v: jnp.ndarray) -> jnp.ndarray:
    """Round with a straight-through (identity) gradient."""
    return v + jax.lax.stop_gradient(jnp.round(v) - v)


def ste_clamp(q: jnp.ndarray, qmin: float, qmax: float) -> jnp.ndarray:
    """``clamp`` with torch gradient semantics: gradient 1 anywhere inside
    the range INCLUSIVE of the endpoints, 0 strictly outside. (``jnp.clip``
    passes only 0.5 at an exact endpoint — see module docstring.)"""
    return jnp.where(q > qmax, qmax, jnp.where(q < qmin, qmin, q))


def ste_floor_plus(v: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    """AdaRound-style rounding ``floor(v) + frac`` with round-pass-through.

    Matches ``modelzoo/modules/range/adaround.py:78-96``: gradient flows only
    through ``frac`` (torch ``floor`` has zero gradient), and the final
    hard-rounding is straight-through.
    """
    x_ada = jax.lax.stop_gradient(jnp.floor(v)) + frac
    return x_ada + jax.lax.stop_gradient(jnp.round(x_ada) - x_ada)


def quantize_core(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    qmin: float,
    qmax: float,
    channel_axis: int = -1,
    round_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """``clamp(round_fn(x/scale - zero), qmin, qmax)`` (still float dtype)."""
    s = broadcast_to_axis(scale, x.ndim, channel_axis)
    z = broadcast_to_axis(zero, x.ndim, channel_axis)
    v = x / s - z
    q = (round_fn or ste_round)(v)
    return ste_clamp(q, qmin, qmax)


def dequantize_core(
    q: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    channel_axis: int = -1,
    static_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``(q + zero) * scale * static_scale`` (reference ``quantizer.py:218``)."""
    s = broadcast_to_axis(scale, q.ndim, channel_axis)
    z = broadcast_to_axis(zero, q.ndim, channel_axis)
    out = (q + z) * s
    if static_scale is not None:
        out = out * broadcast_to_axis(static_scale, q.ndim, channel_axis)
    return out


def fake_quant(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    qmin: float,
    qmax: float,
    channel_axis: int = -1,
    static_scale: Optional[jnp.ndarray] = None,
    awq_scale: Optional[jnp.ndarray] = None,
    awq_axis: int = -2,
    round_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Simulated quantization: quantize then dequantize.

    When ``awq_scale`` is given, the input is pre-scaled along ``awq_axis``
    (the in-channel axis) before quantization and divided back afterwards
    (reference ``quantizer.py:209-220``).
    """
    sd = _SIM_DTYPE
    if (sd is not None and x.dtype == jnp.float32 and round_fn is None
            and awq_scale is None):
        # bf16 fake-quant arithmetic (set_quant_sim_dtype): cast in, run the
        # whole chain narrow, cast back — scale/zero casts keep their STE
        # gradient path. AdaRound rounding (round_fn) stays f32: its V
        # optimization is a parity surface.
        out16 = fake_quant(x.astype(sd), scale.astype(sd), zero.astype(sd),
                           qmin, qmax, channel_axis,
                           None if static_scale is None else static_scale.astype(sd))
        return out16.astype(x.dtype)
    if awq_scale is not None:
        aws = broadcast_to_axis(awq_scale, x.ndim, awq_axis)
        x = x * aws
    q = quantize_core(x, scale, zero, qmin, qmax, channel_axis, round_fn)
    out = dequantize_core(q, scale, zero, channel_axis, static_scale)
    if awq_scale is not None:
        out = out / aws
    return out


def quantize_int(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    spec: QuantSpec,
) -> jnp.ndarray:
    """Quantize to the narrow integer storage dtype (packed/deploy path)."""
    q = quantize_core(x, scale, zero, spec.qmin, spec.qmax, spec.channel_axis)
    return jax.lax.stop_gradient(q).astype(spec.storage_dtype)

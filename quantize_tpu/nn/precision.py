"""Deploy-time carry precision for the packed inference path.

Between packed int8 layers the activation tensor is only an intermediate:
the next layer immediately requantizes it to int8, so carrying it in
bfloat16 instead of float32 halves inter-layer HBM traffic (the usual
TPU bottleneck) at ~int8-quantization-noise-level accuracy cost. Default
stays float32 so simulation-vs-packed bit-exactness tests hold; serving
and benchmarks opt in via :func:`set_packed_carry_dtype`.

No reference analog (the reference's packed path ran f32 dequant + cuDNN,
``quantconv2d.py:198-210``).
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Any

import jax.numpy as jnp

_CARRY_DTYPE: Any = jnp.float32


def set_packed_carry_dtype(dtype: Any) -> None:
    """Set the dtype packed layers cast their outputs to (static at trace)."""
    global _CARRY_DTYPE
    _CARRY_DTYPE = jnp.dtype(dtype) if dtype is not None else jnp.float32


def packed_carry_dtype() -> Any:
    return _CARRY_DTYPE


@contextmanager
def packed_carry(dtype: Any):
    prev = _CARRY_DTYPE
    set_packed_carry_dtype(dtype)
    try:
        yield
    finally:
        set_packed_carry_dtype(prev)

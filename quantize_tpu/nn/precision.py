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
_QIN_CARRY: bool = False


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


_FUSED_RESIDUAL: bool = False


def set_packed_fused_residual(enabled: bool) -> None:
    """Enable the fused 1x1-conv + residual + ReLU Pallas epilogue.

    When on, packed residual blocks route their tail 1x1 conv (bottleneck
    conv3) through :func:`quantize_tpu.ops.pallas.qconv1x1.conv1x1_residual`
    so the conv, the skip add and the ReLU execute as one kernel — the fat
    block-boundary activation is written to HBM exactly once. Falls back to
    the unfused path wherever the structural conditions don't hold (non-1x1,
    strided, grouped, asymmetric weights, act-quantized ReLU, unfolded BN).
    """
    global _FUSED_RESIDUAL
    _FUSED_RESIDUAL = bool(enabled)


def packed_fused_residual() -> bool:
    return _FUSED_RESIDUAL


@contextmanager
def fused_residual(enabled: bool = True):
    prev = _FUSED_RESIDUAL
    set_packed_fused_residual(enabled)
    try:
        yield
    finally:
        set_packed_fused_residual(prev)


def set_packed_qin_carry(enabled: bool) -> None:
    """Enable int8 quantized-domain carries across residual blocks.

    When on, packed residual blocks feed their skip/downsample branches from
    the main-path conv's quantized input (:class:`~.qtensor.QTensor`) rather
    than the float activation — block-boundary tensors then materialize in
    HBM as int8. Skip paths see ``fake_quant(x)`` instead of ``x`` (accuracy
    covered in tests/test_precision.py).
    """
    global _QIN_CARRY
    _QIN_CARRY = bool(enabled)


def packed_qin_carry() -> bool:
    return _QIN_CARRY


@contextmanager
def qin_carry(enabled: bool = True):
    prev = _QIN_CARRY
    set_packed_qin_carry(enabled)
    try:
        yield
    finally:
        set_packed_qin_carry(prev)


_CONV_BARRIER: bool = False


def set_packed_conv_barrier(enabled: bool) -> None:
    """Materialize each packed conv's int8 quantized activation with
    ``lax.optimization_barrier`` before the convolution.

    The ViT campaign found XLA output-fusing a matmul's entire producer
    chain (previous op + nonlinearity + quantize) into the consumer and
    recomputing it per output tile (docs/BENCH_NOTES.md round 2); this flag
    applies the same targeted fix to the CNN path's ``quant_conv2d`` to test
    whether the conv3 above-bound anomaly is producer recompute.
    """
    global _CONV_BARRIER
    _CONV_BARRIER = bool(enabled)


def packed_conv_barrier() -> bool:
    return _CONV_BARRIER

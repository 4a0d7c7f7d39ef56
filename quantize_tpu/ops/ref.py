"""Reference (pure-jnp) implementations of the packed quantized ops.

These play the role of the reference's naive "mode 0" CUDA kernels
(``engine/kernels/functions/linear.cu:32-73``, ``conv2d.cu:40-113``): simple,
obviously-correct implementations used as correctness oracles for the Pallas
fused kernels — and as the CPU fallback path.

Quantization algebra (reference convention, ``quantizer.py:215-218``):

    x̂ = (q + zero) · scale

so a quantized matmul is

    out[m,n] = s_a·s_w[n] · ( Σ_k q_a·q_w + z_a·Σ_k q_w[k,n]
                              + z_w[n]·Σ_k q_a[m,k] + K·z_a·z_w[n] ) + bias

— the zero-point corrections use precomputable column sums, which is what
the fused kernels exploit.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def quantize_activation_int8(
    x: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray, qmin: int, qmax: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize activations for the int8 MXU path.

    Returns (q_int8, effective_zero): unsigned grids ([0, 255]) are shifted
    by -128 into int8 range with the shift folded into the zero point.
    """
    q = jnp.clip(jnp.round(x / scale - zero), qmin, qmax)
    if qmin >= 0:
        q = q - 128.0
        zero = zero + 128.0
    return q.astype(jnp.int8), zero


def quant_matmul_ref(
    x: jnp.ndarray,
    a_scale: jnp.ndarray,
    a_zero: jnp.ndarray,
    a_qmin: int,
    a_qmax: int,
    w_int: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dequantize-on-the-fly matmul, oracle form: dequantize then matmul.

    x: (..., K) float; w_int: (K, N) integer-valued (int8); scales per
    tensor (a) / per out-channel or tensor (w).
    """
    q_a, z_a = quantize_activation_int8(x, a_scale, a_zero, a_qmin, a_qmax)
    a_deq = (q_a.astype(jnp.float32) + z_a) * a_scale
    w_deq = (w_int.astype(jnp.float32) + w_zero[None, :]) * w_scale[None, :]
    out = a_deq @ w_deq
    if bias is not None:
        out = out + bias
    return out


def quant_matmul_int_ref(
    x: jnp.ndarray,
    a_scale: jnp.ndarray,
    a_zero: jnp.ndarray,
    a_qmin: int,
    a_qmax: int,
    w_int: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Same result as :func:`quant_matmul_ref` but via integer accumulation +
    zero-point correction — the algebra the fused MXU kernel implements."""
    q_a, z_a = quantize_activation_int8(x, a_scale, a_zero, a_qmin, a_qmax)
    k = x.shape[-1]
    acc = jax.lax.dot_general(
        q_a, w_int.astype(jnp.int8),
        (((q_a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    col_sum_w = jnp.sum(w_int.astype(jnp.int32), axis=0).astype(jnp.float32)  # (N,)
    row_sum_a = jnp.sum(q_a.astype(jnp.int32), axis=-1, keepdims=True).astype(jnp.float32)
    corrected = (
        acc
        + z_a * col_sum_w[None, :]
        + w_zero[None, :] * row_sum_a
        + k * z_a * w_zero[None, :]
    )
    out = a_scale * w_scale[None, :] * corrected
    if bias is not None:
        out = out + bias
    return out


def quant_matmul_wo_ref(
    x: jnp.ndarray,
    w_int: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weight-only-quantized matmul (float activations), the
    ``quantlinear_float_input`` analog (``quantlinear_float_input.cu:37-117``)."""
    w_deq = (w_int.astype(jnp.float32) + w_zero[None, :]) * w_scale[None, :]
    out = x @ w_deq
    if bias is not None:
        out = out + bias
    return out


def im2col(
    x: jnp.ndarray,
    kh: int,
    kw: int,
    strides: Sequence[int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """NHWC -> (N, H', W', kh*kw*C) patch extraction for conv-as-matmul."""
    n, h, w, c = x.shape
    if padding == "SAME":
        pad_h = max((-(-h // strides[0]) - 1) * strides[0] + kh - h, 0)
        pad_w = max((-(-w // strides[1]) - 1) * strides[1] + kw - w, 0)
        pads = [(pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)]
    elif padding == "VALID":
        pads = [(0, 0), (0, 0)]
    else:
        pads = [tuple(p) for p in padding]
    x = jnp.pad(x, [(0, 0), pads[0], pads[1], (0, 0)])
    h_out = (x.shape[1] - kh) // strides[0] + 1
    w_out = (x.shape[2] - kw) // strides[1] + 1
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), tuple(strides), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # conv_general_dilated_patches returns feature order (C, kh, kw) flattened;
    # reorder to (kh, kw, C) to match HWIO kernel flattening
    patches = patches.reshape(n, h_out, w_out, c, kh * kw)
    patches = jnp.moveaxis(patches, 3, -1).reshape(n, h_out, w_out, kh * kw * c)
    return patches, (h_out, w_out)


def quant_conv2d_ref(
    x: jnp.ndarray,
    a_scale: jnp.ndarray,
    a_zero: jnp.ndarray,
    a_qmin: int,
    a_qmax: int,
    w_int: jnp.ndarray,  # HWIO integer-valued
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    strides: Sequence[int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
) -> jnp.ndarray:
    """Oracle packed conv: dequantize weight + fake-quant input, lax conv."""
    q_a, z_a = quantize_activation_int8(x, a_scale, a_zero, a_qmin, a_qmax)
    a_deq = (q_a.astype(jnp.float32) + z_a) * a_scale
    w_deq = (w_int.astype(jnp.float32) + w_zero) * w_scale  # broadcast on O axis
    out = jax.lax.conv_general_dilated(
        a_deq, w_deq, tuple(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out

"""Pallas fused 1x1-conv + residual-add + ReLU for packed CNN blocks.

Device traces of the packed ResNet-50 W8A8 forward (docs/BENCH_NOTES.md,
per-layer table) put the bottleneck conv3 group (1x1 expand C->4C) at ~59%
of step time, 1.5-2x above its HBM traffic bound: XLA schedules the int8
conv, the residual add + ReLU, and the next layer's quantize in separate
fusions, so the fat (N,56,56,4C) activation round-trips HBM more than once.

A stride-1 1x1 conv is exactly a matmul over M = N*H*W rows, so this kernel
runs the whole block tail in one VMEM pass per (M, N) tile:

    out = relu( s_a * s_w_c * (A_q . W_q + z_a * colsum_c(W_q))
                + bias_c + residual )

reading the int8 activation and the (bf16) residual once and writing the
carry-dtype output once. Weight zero-points must be exactly zero (symmetric
signed — the production packed default); the caller guarantees this.

Functionally replaces the reference ``quantconv2d.cu:50-146`` for the 1x1
case, with the residual epilogue fused (no reference analog — its packed
path dequantized between every layer, ``quantconv2d.py:198-210``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qmatmul import _cdiv, _interpret, _pad_to  # noqa: F401 (shared helpers)


def _conv1x1_res_kernel(a_ref, w_ref, sc_ref, colw_ref, ws_ref, bias_ref,
                        res_ref, out_ref, *, relu: bool):
    acc = jnp.dot(a_ref[:], w_ref[:],
                  preferred_element_type=jnp.int32).astype(jnp.float32)
    a_scale = sc_ref[0, 0]
    z_eff = sc_ref[0, 1]
    out = a_scale * ws_ref[:] * (acc + z_eff * colw_ref[:]) + bias_ref[:]
    out = out + res_ref[:].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "out_dtype",
                                              "block_m", "block_n"))
def _conv1x1_res_call(q_a, w_int, scalars, col_sum_w, w_scale, bias, res,
                      relu: bool = True, out_dtype=jnp.float32,
                      block_m: int = 512, block_n: int = 256):
    m, k = q_a.shape
    n = w_int.shape[1]
    # round tile sizes up to hardware tile multiples (sublane 8 / lane 128):
    # ragged inputs (e.g. m=49 in tests) would otherwise produce non-aligned
    # block shapes that interpret-mode accepts but real Mosaic may not
    rup = lambda v, t: -(-v // t) * t  # noqa: E731
    bm = min(block_m, rup(m, 8))
    bn = min(block_n, rup(n, 128))
    # K is kept whole per tile (<= 512 for ResNet-family bottlenecks); pad it
    # to the int8 sublane tile. Zero-padded K rows/cols contribute nothing
    # (w rows are zero) and col_sum_w is computed on the real K.
    q_a, _ = _pad_to(q_a, 0, bm)
    q_a, _ = _pad_to(q_a, 1, 32)
    w_int, _ = _pad_to(w_int, 0, 32)
    w_int, _ = _pad_to(w_int, 1, bn)
    res, _ = _pad_to(res, 0, bm)
    res, _ = _pad_to(res, 1, bn)
    row = lambda v: _pad_to(v.reshape(1, -1).astype(jnp.float32), 1, bn)[0]  # noqa: E731
    col_sum_w = row(col_sum_w)
    w_scale, bias = row(w_scale), row(bias)
    mp, kp = q_a.shape
    np_ = w_int.shape[1]

    grid = (mp // bm, np_ // bn)
    out = pl.pallas_call(
        functools.partial(_conv1x1_res_kernel, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_
            + mp * np_ * (res.dtype.itemsize + jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(q_a, w_int, scalars, col_sum_w, w_scale, bias, res)
    return out[:m, :n]


def conv1x1_residual(
    q_a: jnp.ndarray,          # (N, H, W, K) int8 (already act-quantized)
    z_eff: jnp.ndarray,        # f32 scalar, shifted-zero convention
    a_scale: jnp.ndarray,      # f32 scalar
    w_int: jnp.ndarray,        # (1, 1, K, Co) or (K, Co) int8, zero w-zero
    w_scale: jnp.ndarray,      # (Co,)
    bias: Optional[jnp.ndarray],
    residual: jnp.ndarray,     # (N, H, W, Co) float
    relu: bool = True,
    col_sum_w: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused ``relu(conv1x1(q_a) + residual)`` on the int8 MXU path.

    Matches :func:`quantize_tpu.ops.qconv.quant_conv2d` (w_zero_is_zero=True,
    1x1/stride-1/groups-1) followed by the residual add and ReLU; cross-
    tested in tests/test_qconv1x1.py.
    """
    if w_int.ndim == 4:
        w_int = w_int.reshape(w_int.shape[2], w_int.shape[3])
    n, h, w_sp, k = q_a.shape
    co = w_int.shape[1]
    if col_sum_w is None:
        col_sum_w = jnp.sum(w_int.astype(jnp.int32), axis=0)
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    if out_dtype is None:
        out_dtype = residual.dtype
    scalars = jnp.stack([jnp.asarray(a_scale, jnp.float32).reshape(()),
                         jnp.asarray(z_eff, jnp.float32).reshape(())]).reshape(1, 2)
    out = _conv1x1_res_call(
        q_a.reshape(-1, k), w_int, scalars, col_sum_w, w_scale, bias,
        residual.reshape(-1, co), relu=relu, out_dtype=jnp.dtype(out_dtype))
    return out.reshape(n, h, w_sp, co)

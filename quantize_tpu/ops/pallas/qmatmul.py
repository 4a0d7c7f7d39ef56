"""Pallas fused dequantize-matmul kernels (TPU MXU int8 path).

Replaces the reference CUDA kernels ``quantlinear.cu:62-120`` (int x int) and
``quantlinear_float_input.cu:37-117`` (float x packed weight) with MXU-native
designs:

* **W8A8** (:func:`quant_matmul_w8a8`): activations quantized to int8 (a
  separate VPU-fusable step), int8 x int8 -> int32 on the MXU, zero-point
  corrections and per-channel rescale in the epilogue. Zero points stay
  *float* (the reference's ``zero = xmin/scale`` is fractional,
  ``minmax.py:143``), so corrections are applied in f32 after integer
  accumulation:

      out = s_a·s_w·(A·W + z_a·colsum(W) + z_w·rowsum(A) + K·z_a·z_w) + bias

  ``colsum(W)`` is precomputed at pack time; ``rowsum(A)`` accumulates in
  the kernel alongside the matmul.

* **W4A8** (:func:`quant_matmul_w4a8`): int4 weights packed two-per-int8 in
  a *split-half* layout along K (low nibbles = rows [0, K/2), high nibbles =
  rows [K/2, K)) — unpacking is two VPU shifts and NO interleave, and each
  packed block feeds two MXU calls against two activation blocks. This
  halves weight HBM traffic vs int8.

* **weight-only** (:func:`quant_matmul_wo`): float (bf16) activations x int
  weight dequantized in-kernel — the ``quantconv2d_float_input`` analog the
  BASELINE names.

All kernels fall back to interpret mode off-TPU so the same code path is
unit-testable on the CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x: jnp.ndarray, axis: int, mult: int):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


# ---------------------------------------------------------------------------
# activation quantization (VPU; XLA fuses with surrounding ops)
# ---------------------------------------------------------------------------

def quantize_act_int8(x: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray,
                      qmin: int, qmax: int):
    """float -> int8 with the unsigned grid shifted into int8 range.

    Returns (q_int8, effective_zero_f32). See ``ops/ref.py`` oracle.
    """
    # compute the grid index in f32 even for bf16 carries: bf16's 8-bit
    # mantissa would perturb round() near half-integer boundaries
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale - zero), qmin, qmax)
    z_eff = jnp.asarray(zero, jnp.float32)
    if qmin >= 0:
        q = q - 128.0
        z_eff = z_eff + 128.0
    return q.astype(jnp.int8), z_eff


# ---------------------------------------------------------------------------
# W8A8 fused matmul
# ---------------------------------------------------------------------------

def _w8a8_kernel(a_ref, w_ref, sca_ref, colw_ref, ws_ref, wz_ref, bias_ref,
                 out_ref, acc_ref, rs_ref, *, n_k: int, k_total: int,
                 w_zero_is_zero: bool = False):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if not w_zero_is_zero:
            rs_ref[:] = jnp.zeros_like(rs_ref)

    a = a_ref[:]
    acc_ref[:] += jnp.dot(a, w_ref[:], preferred_element_type=jnp.int32)
    if not w_zero_is_zero:
        rs_ref[:] += jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(kk == n_k - 1)
    def _():
        a_scale = sca_ref[0, 0]
        a_zero = sca_ref[0, 1]
        acc = acc_ref[:].astype(jnp.float32)
        colw = colw_ref[:].astype(jnp.float32)
        corrected = acc + a_zero * colw
        if not w_zero_is_zero:
            rs = rs_ref[:].astype(jnp.float32)
            wz = wz_ref[:]
            corrected = corrected + wz * rs + k_total * a_zero * wz
        out = a_scale * ws_ref[:] * corrected + bias_ref[:]
        out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                              "w_zero_is_zero"))
def _w8a8_call(q_a, w_int, scalars, col_sum_w, w_scale, w_zero, bias,
               block_m: int = 256, block_n: int = 256, block_k: int = 512,
               w_zero_is_zero: bool = False):
    m, k = q_a.shape
    n = w_int.shape[1]
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    q_a, _ = _pad_to(q_a, 0, bm)
    q_a, _ = _pad_to(q_a, 1, bk)
    w_int, _ = _pad_to(w_int, 0, bk)
    w_int, _ = _pad_to(w_int, 1, bn)
    mp, kp = q_a.shape
    np_ = w_int.shape[1]
    row = lambda v: _pad_to(v.reshape(1, -1).astype(jnp.float32), 1, bn)[0]  # noqa: E731
    col_sum_w = _pad_to(col_sum_w.reshape(1, -1).astype(jnp.int32), 1, bn)[0]
    w_scale, w_zero, bias = row(w_scale), row(w_zero), row(bias)

    n_k = kp // bk
    grid = (mp // bm, np_ // bn, n_k)
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k, k_total=k,
                          w_zero_is_zero=w_zero_is_zero),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j, kk: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.int32),
            pltpu.VMEM((bm, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(q_a, w_int, scalars, col_sum_w, w_scale, w_zero, bias)
    return out[:m, :n]


def quant_matmul_w8a8(
    x: jnp.ndarray,
    a_scale: jnp.ndarray,
    a_zero: jnp.ndarray,
    a_qmin: int,
    a_qmax: int,
    w_int: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    col_sum_w: Optional[jnp.ndarray] = None,
    w_zero_is_zero: bool = False,
    pre_q=None,
) -> jnp.ndarray:
    """Fused W8A8 matmul. ``x``: (..., K) float; ``w_int``: (K, N) int8."""
    if _MATMUL_BACKEND == "xla":
        return quant_matmul_w8a8_xla(x, a_scale, a_zero, a_qmin, a_qmax,
                                     w_int, w_scale, w_zero, bias, col_sum_w,
                                     w_zero_is_zero, pre_q)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w_int.shape[1]
    if pre_q is not None:
        q_a, z_eff = pre_q
        q_a = q_a.reshape(-1, k)
    else:
        q_a, z_eff = quantize_act_int8(x.reshape(-1, k), a_scale, a_zero,
                                       a_qmin, a_qmax)
    if col_sum_w is None:
        col_sum_w = jnp.sum(w_int.astype(jnp.int32), axis=0)
    scalars = jnp.stack([jnp.asarray(a_scale, jnp.float32).reshape(()),
                         z_eff.reshape(())]).reshape(1, 2)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    out = _w8a8_call(q_a, w_int.astype(jnp.int8), scalars, col_sum_w,
                     w_scale, w_zero, bias, w_zero_is_zero=w_zero_is_zero)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# W4A8: split-half nibble packing + fused unpack-matmul
# ---------------------------------------------------------------------------

def pack_int4_splithalf(q: jnp.ndarray) -> jnp.ndarray:
    """Pack signed int4 (K, N) into (K/2, N) int8: row r holds row r in the
    low nibble and row r + K/2 in the high nibble. K must be even."""
    k = q.shape[0]
    assert k % 2 == 0, "K must be even for split-half int4 packing"
    lo = q[: k // 2].astype(jnp.int8)
    hi = q[k // 2:].astype(jnp.int8)
    return ((lo & jnp.int8(0x0F)) | (hi.astype(jnp.uint8) << 4).astype(jnp.int8)).astype(jnp.int8)


def unpack_int4_splithalf(p: jnp.ndarray) -> jnp.ndarray:
    lo = (p.astype(jnp.int8) << 4) >> 4
    hi = p.astype(jnp.int8) >> 4
    return jnp.concatenate([lo, hi], axis=0)


def _w4a8_kernel(a_lo_ref, a_hi_ref, wp_ref, sca_ref, ws_ref, wz_ref, bias_ref,
                 out_ref, acc_ref, rs_ref, csum_ref, *, n_k: int, k_total: int,
                 w_zero_is_zero: bool = False):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        csum_ref[:] = jnp.zeros_like(csum_ref)
        if not w_zero_is_zero:
            rs_ref[:] = jnp.zeros_like(rs_ref)

    # Mosaic has no i8 vector shifts — widen to i32, shift there, narrow back.
    # low nibble sign-extension: ((v & 15) ^ 8) - 8; high nibble: arithmetic
    # shift of the sign-extended byte.
    wp32 = wp_ref[:].astype(jnp.int32)
    w_lo = (((wp32 & 15) ^ 8) - 8).astype(jnp.int8)
    w_hi = (wp32 >> 4).astype(jnp.int8)
    a_lo = a_lo_ref[:]
    a_hi = a_hi_ref[:]
    acc_ref[:] += jnp.dot(a_lo, w_lo, preferred_element_type=jnp.int32)
    acc_ref[:] += jnp.dot(a_hi, w_hi, preferred_element_type=jnp.int32)
    csum_ref[:] += jnp.sum(w_lo.astype(jnp.int32), axis=0, keepdims=True)
    csum_ref[:] += jnp.sum(w_hi.astype(jnp.int32), axis=0, keepdims=True)
    if not w_zero_is_zero:
        rs_ref[:] += jnp.sum(a_lo.astype(jnp.int32), axis=1, keepdims=True)
        rs_ref[:] += jnp.sum(a_hi.astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(kk == n_k - 1)
    def _():
        a_scale = sca_ref[0, 0]
        a_zero = sca_ref[0, 1]
        acc = acc_ref[:].astype(jnp.float32)
        colw = csum_ref[:].astype(jnp.float32)
        corrected = acc + a_zero * colw
        if not w_zero_is_zero:
            rs = rs_ref[:].astype(jnp.float32)
            wz = wz_ref[:]
            corrected = corrected + wz * rs + k_total * a_zero * wz
        out_ref[:] = a_scale * ws_ref[:] * corrected + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                              "w_zero_is_zero"))
def _w4a8_call(q_a, w_packed, scalars, w_scale, w_zero, bias,
               block_m: int = 256, block_n: int = 256, block_k: int = 256,
               w_zero_is_zero: bool = False):
    """q_a: (M, K) int8; w_packed: (K/2, N) int8 split-half nibbles."""
    m, k = q_a.shape
    kh = k // 2
    n = w_packed.shape[1]
    bm, bn = min(block_m, m), min(block_n, n)
    bk = min(block_k, kh)  # block over the *packed* (half) K axis
    q_a, _ = _pad_to(q_a, 0, bm)
    # pad halves independently so each stays aligned to bk
    a_lo, a_hi = q_a[:, :kh], q_a[:, kh:]
    a_lo, _ = _pad_to(a_lo, 1, bk)
    a_hi, _ = _pad_to(a_hi, 1, bk)
    q_a2 = jnp.concatenate([a_lo, a_hi], axis=1)
    w_packed, _ = _pad_to(w_packed, 0, bk)
    w_packed, _ = _pad_to(w_packed, 1, bn)
    mp = q_a2.shape[0]
    khp = a_lo.shape[1]
    np_ = w_packed.shape[1]
    row = lambda v: _pad_to(v.reshape(1, -1).astype(jnp.float32), 1, bn)[0]  # noqa: E731
    w_scale, w_zero, bias = row(w_scale), row(w_zero), row(bias)

    n_k = khp // bk
    grid = (mp // bm, np_ // bn, n_k)
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, n_k=n_k, k_total=k,
                          w_zero_is_zero=w_zero_is_zero),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, kk, khb=khp // bk: (i, kk + khb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j, kk: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.int32),
            pltpu.VMEM((bm, 1), jnp.int32),
            pltpu.VMEM((1, bn), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * 2 * khp,
            bytes_accessed=mp * 2 * khp + khp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(q_a2, q_a2, w_packed, scalars, w_scale, w_zero, bias)
    return out[:m, :n]


def quant_matmul_w4a8(
    x: jnp.ndarray,
    a_scale: jnp.ndarray,
    a_zero: jnp.ndarray,
    a_qmin: int,
    a_qmax: int,
    w_packed: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    col_sum_w: Optional[jnp.ndarray] = None,
    w_zero_is_zero: bool = False,
    pre_q=None,
) -> jnp.ndarray:
    """Fused W4A8 matmul over split-half packed weights ((K/2, N) int8)."""
    if _MATMUL_BACKEND == "xla":
        # in-graph nibble unpack (elementwise on the small weight) + native
        # int8 dot: XLA fuses the unpack into the matmul's operand and the
        # epilogue into consumers — no pallas_call fusion barrier
        w_int = unpack_int4_splithalf(w_packed)
        return quant_matmul_w8a8_xla(x, a_scale, a_zero, a_qmin, a_qmax,
                                     w_int, w_scale, w_zero, bias, col_sum_w,
                                     w_zero_is_zero, pre_q)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w_packed.shape[1]
    if pre_q is not None:
        q_a, z_eff = pre_q
        q_a = q_a.reshape(-1, k)
    else:
        q_a, z_eff = quantize_act_int8(x.reshape(-1, k), a_scale, a_zero,
                                       a_qmin, a_qmax)
    scalars = jnp.stack([jnp.asarray(a_scale, jnp.float32).reshape(()),
                         z_eff.reshape(())]).reshape(1, 2)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    out = _w4a8_call(q_a, w_packed.astype(jnp.int8), scalars, w_scale, w_zero,
                     bias, w_zero_is_zero=w_zero_is_zero)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# Weight-only quantized matmul (float activations)
# ---------------------------------------------------------------------------

def _wo_kernel(a_ref, w_ref, ws_ref, wz_ref, bias_ref, out_ref, acc_ref, *, n_k: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = (w_ref[:].astype(jnp.float32) + wz_ref[:]) * ws_ref[:]
    acc_ref[:] += jnp.dot(a_ref[:], w.astype(a_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:] + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def _wo_call(x, w_int, w_scale, w_zero, bias,
             block_m: int = 256, block_n: int = 256, block_k: int = 512):
    m, k = x.shape
    n = w_int.shape[1]
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    x, _ = _pad_to(x, 0, bm)
    x, _ = _pad_to(x, 1, bk)
    w_int, _ = _pad_to(w_int, 0, bk)
    w_int, _ = _pad_to(w_int, 1, bn)
    mp, kp = x.shape
    np_ = w_int.shape[1]
    row = lambda v: _pad_to(v.reshape(1, -1).astype(jnp.float32), 1, bn)[0]  # noqa: E731
    w_scale, w_zero, bias = row(w_scale), row(w_zero), row(bias)

    n_k = kp // bk
    grid = (mp // bm, np_ // bn, n_k)
    out = pl.pallas_call(
        functools.partial(_wo_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, w_int, w_scale, w_zero, bias)
    return out[:m, :n]


def _dequant_weight(w_int, w_scale, w_zero, awq_recip=None, group_size: int = 0):
    """Elementwise weight dequant supporting AWQ deploy layouts.

    ``group_size`` > 0: ``w_scale``/``w_zero`` hold (N * K/g,) per-group
    values laid out groups-along-K per out column (the reference AWQ
    ``q_group_size`` grid, ``awq.py:119-121``). ``awq_recip`` (K,) folds the
    1/awq_scale in-channel divisor into the dequantized weight."""
    k_dim, n = w_int.shape
    w = w_int.astype(jnp.float32)
    if group_size:
        s_elem = jnp.repeat(w_scale.reshape(n, k_dim // group_size), group_size, axis=1).T
        z_elem = jnp.repeat(w_zero.reshape(n, k_dim // group_size), group_size, axis=1).T
        w_deq = (w + z_elem) * s_elem
    else:
        w_deq = (w + w_zero.reshape(1, -1)) * w_scale.reshape(1, -1)
    if awq_recip is not None:
        w_deq = w_deq * awq_recip.reshape(-1, 1)
    return w_deq


def quant_matmul_wo(
    x: jnp.ndarray,
    w_int: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    awq_recip: Optional[jnp.ndarray] = None,
    group_size: int = 0,
) -> jnp.ndarray:
    """Weight-only quantized matmul: float acts x int8-stored weights."""
    lead = x.shape[:-1]
    n = w_int.shape[1]
    if _MATMUL_BACKEND == "xla" or awq_recip is not None or group_size:
        # dequantize the (small) weight elementwise; matmul in bf16 on TPU
        # (f32 accumulate), f32 elsewhere for test determinism. AWQ/grouped
        # layouts always take this path (the Pallas wo kernel models only
        # per-out-channel scales).
        w_deq = _dequant_weight(w_int, w_scale, w_zero, awq_recip, group_size)
        cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        x2 = x.reshape(-1, x.shape[-1])
        out = jax.lax.dot_general(
            x2.astype(cdt), w_deq.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            out = out + bias
        return out.reshape(*lead, n)
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    out = _wo_call(x2, w_int.astype(jnp.int8), w_scale, w_zero, bias)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# XLA-native variants — THE production matmul backend (final design).
#
# Verdict after device-trace bake-offs on v5e (docs/BENCH_NOTES.md,
# scripts/bench_mm_shapes.py): for *plain quantized matmuls* XLA's native
# `dot_general(int8, int8) -> int32` + fused elementwise epilogue beats the
# hand-written Pallas kernels at every production shape — each pallas_call
# is a fusion barrier, so the activation quantize, pad-to-block/slice-back,
# and epilogue all materialize separately (ViT-B/16 W4A8 spent ~35 ms/step
# in reshape/copy/slice/pad alone on the Pallas path). Pallas wins where
# *fusion across ops* is the point, and those kernels ARE shipped as the
# default packed path: fused LayerNorm(+int8 quantize) (ops/pallas/
# layernorm.py) and fused multi-head attention (ops/pallas/attention.py).
#
# The Pallas matmul kernels below are retained as the explicit-kernel
# oracle tier (`set_matmul_backend("pallas")`): cross-tested against the
# XLA variants in tests/test_qmatmul.py, exactly the role the reference's
# naive mode-0 CUDA kernels played (linear.cu:144).
# ---------------------------------------------------------------------------

_MATMUL_BACKEND = "xla"  # "xla" | "pallas"


def set_matmul_backend(name: str) -> None:
    """Select the packed matmul implementation ("xla" or "pallas")."""
    global _MATMUL_BACKEND
    assert name in ("xla", "pallas"), name
    _MATMUL_BACKEND = name


def matmul_backend() -> str:
    return _MATMUL_BACKEND

def quant_matmul_w8a8_xla(
    x, a_scale, a_zero, a_qmin, a_qmax, w_int, w_scale, w_zero,
    bias=None, col_sum_w=None, w_zero_is_zero: bool = False,
    pre_q=None,
):
    """Same math via ``lax.dot_general(int8, int8) -> int32`` + fused epilogue.

    XLA hits the MXU int8 path natively; kept as a production alternative and
    as the baseline the Pallas kernel must beat.

    ``w_zero_is_zero`` (static) drops the ``rowsum(A)`` correction terms —
    with symmetric signed weights (the production default) they are exactly
    zero, and skipping them removes a full reduce over the quantized
    activation (device traces showed these reduces costing ~30% of the
    ViT-B/16 W4A8 step). ``pre_q`` supplies an already-quantized
    ``(q_a, z_eff)`` pair so one quantize can feed several matmuls.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    if pre_q is not None:
        q_a, z_eff = pre_q
        q_a = q_a.reshape(-1, k)
    else:
        q_a, z_eff = quantize_act_int8(x.reshape(-1, k), a_scale, a_zero,
                                       a_qmin, a_qmax)
        # materialize the int8 activation: without this, XLA output-fuses
        # the whole producer chain (previous matmul + nonlinearity +
        # quantize) INTO this matmul's fusion and recomputes it per output
        # tile — device traces showed the ViT fc2 matmul costing 6x its
        # roofline because fc1+gelu re-ran inside it. The int8 write/read
        # (1 byte/elem) is far cheaper than any recompute.
        q_a = jax.lax.optimization_barrier(q_a)
    acc = jax.lax.dot_general(
        q_a, w_int.astype(jnp.int8), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    if col_sum_w is None:
        col_sum_w = jnp.sum(w_int.astype(jnp.int32), axis=0)
    corrected = acc + z_eff * col_sum_w.astype(jnp.float32)[None, :]
    if not w_zero_is_zero:
        rs = jnp.sum(q_a.astype(jnp.int32), axis=-1, keepdims=True).astype(jnp.float32)
        wz = w_zero.reshape(1, -1)
        corrected = corrected + wz * rs + k * z_eff * wz
    out = jnp.asarray(a_scale, jnp.float32) * w_scale.reshape(1, -1) * corrected
    if bias is not None:
        out = out + bias
    return out.reshape(*lead, w_int.shape[1])

"""Pallas fused LayerNorm kernels (TPU VPU path).

Device traces of the packed ViT-B/16 forward showed flax's LayerNorm
lowering to per-block ``convert_reduce`` fusions costing ~1.9 ms each at
batch 128 — ~40% of the whole step (docs/BENCH_NOTES.md). These kernels do
the whole normalize in one VMEM-resident pass per row tile:

* :func:`layernorm` — plain fused LayerNorm, f32 statistics, output in the
  requested carry dtype.
* :func:`layernorm_quant_int8` — LayerNorm fused with the *consumer's*
  activation quantization: emits int8 directly (plus the effective zero
  point), never materializing the normalized bf16 tensor in HBM. Used in
  packed transformer blocks where the LN output feeds only quantized
  matmuls (qkv / mlp-fc1), replacing the reference's float LayerNorm +
  separate quantize (``quantmultiheadattention.py:285-360`` dataflow).

Both fall back to interpret mode off-TPU so the same code path is
unit-testable on the CPU mesh; feature dims must be lane-aligned (multiples
of 128 — all zoo models: 512/768/1024) or a jnp fallback is used.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


_ROW_TILE = 256


def _ln_math(x32, g32, b32, eps: float):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * g32 + b32


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x32 = x_ref[:].astype(jnp.float32)
    y = _ln_math(x32, g_ref[:].astype(jnp.float32),
                 b_ref[:].astype(jnp.float32), eps)
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_q_kernel(x_ref, g_ref, b_ref, sa_ref, za_ref, q_ref, *,
                 eps: float, qmin: int, qmax: int):
    x32 = x_ref[:].astype(jnp.float32)
    y = _ln_math(x32, g_ref[:].astype(jnp.float32),
                 b_ref[:].astype(jnp.float32), eps)
    q = jnp.clip(jnp.round(y / sa_ref[0, 0] - za_ref[0, 0]), qmin, qmax)
    if qmin >= 0:  # unsigned grid shifted into int8 range (see qmatmul)
        q = q - 128.0
    q_ref[:] = q.astype(jnp.int8)


def _rows(x: jnp.ndarray):
    d = x.shape[-1]
    return x.reshape(-1, d), x.shape[:-1], d


def layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
              eps: float = 1e-6, out_dtype=None) -> jnp.ndarray:
    """Fused LayerNorm over the last axis. f32 statistics regardless of the
    carry dtype (bf16 mean/var would lose ~3 decimal digits)."""
    out_dtype = out_dtype or x.dtype
    x2, lead, d = _rows(x)
    if d % 128 != 0:
        y = _ln_math(x2.astype(jnp.float32), scale.astype(jnp.float32),
                     bias.astype(jnp.float32), eps)
        return y.astype(out_dtype).reshape(*lead, d)
    r = x2.shape[0]
    tr = min(_ROW_TILE, max(8, r))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(_cdiv(r, tr),),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(x2, scale.reshape(1, d), bias.reshape(1, d))
    return out.reshape(*lead, d)


def layernorm_quant_int8(x: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, eps: float,
                         a_scale, a_zero, qmin: int, qmax: int):
    """LayerNorm fused with int8 activation quantization.

    Returns ``(q_int8, z_eff)`` with exactly the
    :func:`~quantize_tpu.ops.pallas.qmatmul.quantize_act_int8` convention, so
    the result feeds ``quant_matmul_*(..., pre_q=(q, z_eff))`` directly.
    """
    x2, lead, d = _rows(x)
    z_eff = jnp.asarray(a_zero, jnp.float32)
    if qmin >= 0:
        z_eff = z_eff + 128.0
    if d % 128 != 0:
        from .qmatmul import quantize_act_int8

        y = _ln_math(x2.astype(jnp.float32), scale.astype(jnp.float32),
                     bias.astype(jnp.float32), eps)
        q, z_eff = quantize_act_int8(y, a_scale, a_zero, qmin, qmax)
        return q.reshape(*lead, d), z_eff
    r = x2.shape[0]
    tr = min(_ROW_TILE, max(8, r))
    q = pl.pallas_call(
        functools.partial(_ln_q_kernel, eps=eps, qmin=qmin, qmax=qmax),
        grid=(_cdiv(r, tr),),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tr, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(x2, scale.reshape(1, d), bias.reshape(1, d),
      jnp.asarray(a_scale, jnp.float32).reshape(1, 1),
      jnp.asarray(a_zero, jnp.float32).reshape(1, 1))
    return q.reshape(*lead, d), z_eff

"""Pallas fused multi-head attention for packed transformer inference.

Replaces the packed path's unfused attention middle — head split/merge
transposes, f32->bf16 casts, q/k/v slices, a materialized (B, H, S, S)
score tensor, and multi-kernel softmax — with ONE kernel per (batch,
q-tile): per head, scores = qk^T/sqrt(d) in f32, softmax in VMEM, @v,
written straight in (B, S, E) layout. Device traces of ViT-B/16 W4A8 showed
that middle costing ~half the step; here the score matrix never touches HBM.

The kernel reads the *fused* qkv projection output directly, viewed as
(B, S, 3H, D) (a free reshape of (B, S, 3E)): q lives at head index h, k at
H + h, v at 2H + h, so no q/k/v slice or head transpose ever materializes.
TPU block shapes require the last two dims be (8, 128)-divisible or whole,
hence the whole (3H, D) tail is blocked and heads are iterated in-kernel
(a static Python loop over MXU calls). Sequence lengths are arbitrary (q is
tiled raggedly; k/v load whole rows — at image/text lengths (197/77) they
fit VMEM trivially).

Covers the attention math of the reference's
``F.multi_head_attention_forward`` call (``quantmultiheadattention.py:
377-396``) for the packed deploy path; simulation modes keep the jnp
einsum implementation (differentiable, any platform).
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


def _mha_kernel(q_ref, kv_ref, o_ref, *, num_heads: int, scale: float,
                causal: bool, tile_q: int):
    h = num_heads
    row0 = pl.program_id(1) * tile_q
    x = q_ref[0]                                     # (TQ, 3H, D)
    kv = kv_ref[0]                                   # (S, 3H, D)
    # head-major views (batch dims must lead for Mosaic matmuls). Transpose
    # in f32 — bf16 sublane transposes profiled ~2x slower (packed-pair
    # relayout) — then cast the matmul operands back to bf16 for MXU rate.
    qt = jnp.transpose(x[:, :h, :].astype(jnp.float32), (1, 0, 2)) * scale
    kt = jnp.transpose(kv[:, h:2 * h, :].astype(jnp.float32), (1, 0, 2))
    vt = jnp.transpose(kv[:, 2 * h:, :].astype(jnp.float32), (1, 0, 2))
    mm_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype
    scores = jax.lax.dot_general(                    # (H, TQ, S) f32
        qt.astype(mm_dtype), kt.astype(mm_dtype),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + row0
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(cols <= rows, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(                       # (H, TQ, D)
        p.astype(mm_dtype), vt.astype(mm_dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = jnp.transpose(out, (1, 0, 2)).astype(o_ref.dtype)


def mha_fused_qkv(qkv: jnp.ndarray, num_heads: int, causal: bool = False,
                  out_dtype=None) -> jnp.ndarray:
    """Multi-head self-attention over a fused qkv tensor.

    Args:
        qkv: (B, S, 3E) — the fused q/k/v projection output.
        num_heads: H; head_dim = E // H.
        causal: apply a causal mask (CLIP text tower).
    Returns:
        (B, S, E) attention output (pre out-projection).
    """
    b, s, three_e = qkv.shape
    e = three_e // 3
    d = e // num_heads
    assert e * 3 == three_e and d * num_heads == e
    out_dtype = out_dtype or qkv.dtype
    if d % 8 != 0:
        return _mha_ref(qkv, num_heads, causal, out_dtype)
    tile_q = min(256, max(8, s))
    # VMEM guard: the kernel loads whole k/v rows per block plus f32 copies
    # and an (H, TQ, S) f32 score tile. At its stated scope (S=197/77) this
    # is ~2-3 MB; a long-sequence caller would otherwise die opaquely inside
    # Mosaic. Budget ~12 MB of the ~16 MB/core VMEM, else fall back to jnp.
    itemsize = jnp.dtype(qkv.dtype).itemsize
    vmem_est = (
        (tile_q + s) * 3 * num_heads * d * itemsize   # q tile + kv rows
        + (tile_q + 2 * s) * 3 * num_heads * d * 4     # qt/kt/vt f32 copies
        + 2 * num_heads * tile_q * s * 4               # scores + softmax f32
        + tile_q * num_heads * d * (itemsize + 4)      # out tile (+f32 acc)
    )
    if vmem_est > 12 * 1024 * 1024:
        return _mha_ref(qkv, num_heads, causal, out_dtype)
    grid = (b, _cdiv(s, tile_q))
    qkv4 = qkv.reshape(b, s, 3 * num_heads, d)

    out = pl.pallas_call(
        functools.partial(_mha_kernel, num_heads=num_heads,
                          scale=1.0 / (d ** 0.5), causal=causal,
                          tile_q=tile_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, 3 * num_heads, d),
                         lambda bi, si: (bi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 3 * num_heads, d),
                         lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, num_heads, d),
                               lambda bi, si: (bi, si, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, num_heads, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(qkv4, qkv4)
    return out.reshape(b, s, e)


def _mha_ref(qkv: jnp.ndarray, num_heads: int, causal: bool,
             out_dtype) -> jnp.ndarray:
    """jnp oracle (also the fallback for exotic head dims)."""
    b, s, three_e = qkv.shape
    e = three_e // 3
    d = e // num_heads
    q, k, v = qkv[..., :e], qkv[..., e:2 * e], qkv[..., 2 * e:]

    def split(t):
        return t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh.astype(jnp.float32),
                        kh.astype(jnp.float32)) / (d ** 0.5)
    if causal:
        mask = jnp.triu(jnp.full((s, s), -1e30, jnp.float32), k=1)
        scores = scores + mask
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).reshape(b, s, e).astype(out_dtype)

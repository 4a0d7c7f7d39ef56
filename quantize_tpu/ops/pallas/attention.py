"""Pallas fused multi-head attention for packed transformer inference.

Replaces the packed path's unfused attention middle — head split/merge
transposes, f32->bf16 casts, q/k/v slices, a materialized (B, H, S, S)
score tensor, and multi-kernel softmax — with ONE kernel per batch row
block: per head, scores = qk^T/sqrt(d) in f32, softmax in VMEM, @v,
written straight back in row-major layout. The score matrix never touches
HBM.

ROW LAYOUT (round-3 redesign): the kernel reads the fused qkv projection
output as 2-D ``(B*S, 3E)`` rows and slices each head's lanes in-kernel
(q at ``[h*d, (h+1)*d)``, k at ``E + h*d``, v at ``2E + h*d``). Device
traces showed the previous design's 4-D ``(B, S, 3H, D)`` view costing
~0.6 ms *per layer* in XLA relayouts (S=197 is not sublane-aligned and
D=64 wastes half the lanes — HLO: ``bf16[128,197,36,64]`` reshapes were
21% of the ViT-B/16 step). Rows in, rows out: no reshape materializes
anywhere, and the packed ViT encoder carries activations as 2-D
``(B*S, E)`` end-to-end.

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


def _mha_rows_kernel(x_ref, o_ref, *, num_heads: int, head_dim: int,
                     embed: int, scale: float, causal: bool,
                     valid_len: int):
    h, d, e = num_heads, head_dim, embed
    x = x_ref[:]                                     # (S, 3E)
    s = x.shape[0]
    mm_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype
    outs = []
    for hh in range(h):
        qh = (x[:, hh * d:(hh + 1) * d].astype(jnp.float32) * scale)
        kh = x[:, e + hh * d:e + (hh + 1) * d]
        vh = x[:, 2 * e + hh * d:2 * e + (hh + 1) * d]
        scores = jax.lax.dot_general(                # (S, S) f32
            qh.astype(mm_dtype), kh.astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if causal or valid_len < s:
            rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            ok = cols < valid_len  # pad keys never attended
            if causal:
                ok = jnp.logical_and(ok, cols <= rows)
            scores = jnp.where(ok, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        ex = jnp.exp(scores - m)
        p = ex / jnp.sum(ex, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(             # (S, D)
            p.astype(mm_dtype), vh.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def mha_fused_qkv_rows(qkv: jnp.ndarray, num_heads: int, seq_len: int,
                       causal: bool = False, out_dtype=None,
                       valid_len: int = 0) -> jnp.ndarray:
    """Multi-head self-attention over fused qkv rows.

    Args:
        qkv: (B*S, 3E) — the fused q/k/v projection output, batch-major rows.
            Mosaic blocks per batch need ``S % 8 == 0``: callers with ragged
            sequences (ViT's 197) pad S up and pass the true ``valid_len`` —
            pad keys are masked out in-kernel, pad query rows carry garbage
            that the caller's row layout keeps isolated.
        num_heads: H; head_dim = E // H.
        seq_len: S (static, padded); B = rows // S.
        causal: apply a causal mask (CLIP text tower).
        valid_len: number of real rows per batch (0 = all of seq_len).
    Returns:
        (B*S, E) attention output (pre out-projection), same row layout.
    """
    rows, three_e = qkv.shape
    e = three_e // 3
    d = e // num_heads
    s = int(seq_len)
    b = rows // s
    valid = int(valid_len) or s
    assert e * 3 == three_e and d * num_heads == e and b * s == rows
    out_dtype = out_dtype or qkv.dtype
    itemsize = jnp.dtype(qkv.dtype).itemsize
    # VMEM budget: input block + f32 head slices + (S, S) f32 scores +
    # f32 out concat. ~12 MB of the ~16 MB/core VMEM, else jnp fallback.
    vmem_est = (s * three_e * itemsize          # input rows
                + 3 * s * d * 4                 # qh/kh/vh f32
                + 2 * s * s * 4                 # scores + softmax f32
                + s * e * (4 + itemsize))       # out concat + store
    if d % 8 != 0 or s % 8 != 0 or vmem_est > 12 * 1024 * 1024:
        return _mha_ref_rows(qkv, num_heads, s, causal, out_dtype, valid)

    out = pl.pallas_call(
        functools.partial(_mha_rows_kernel, num_heads=num_heads, head_dim=d,
                          embed=e, scale=1.0 / (d ** 0.5), causal=causal,
                          valid_len=valid),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((s, three_e), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, e), lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, e), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(qkv)
    return out


def mha_fused_qkv(qkv: jnp.ndarray, num_heads: int, causal: bool = False,
                  out_dtype=None) -> jnp.ndarray:
    """3-D convenience wrapper: (B, S, 3E) -> (B, S, E) via the rows kernel,
    padding ragged S up to the sublane multiple (pad keys masked)."""
    b, s, three_e = qkv.shape
    e = three_e // 3
    s_pad = _cdiv(s, 8) * 8
    valid = s
    if s_pad != s:
        qkv = jnp.pad(qkv, ((0, 0), (0, s_pad - s), (0, 0)))
    out = mha_fused_qkv_rows(qkv.reshape(b * s_pad, three_e), num_heads,
                             s_pad, causal=causal, out_dtype=out_dtype,
                             valid_len=valid)
    out = out.reshape(b, s_pad, e)
    return out[:, :s] if s_pad != s else out


def _mha_ref_rows(qkv: jnp.ndarray, num_heads: int, s: int, causal: bool,
                  out_dtype, valid_len: int = 0) -> jnp.ndarray:
    rows, three_e = qkv.shape
    e = three_e // 3
    out = _mha_ref(qkv.reshape(rows // s, s, three_e), num_heads, causal,
                   out_dtype, valid_len)
    return out.reshape(rows, e)


def _mha_ref(qkv: jnp.ndarray, num_heads: int, causal: bool,
             out_dtype, valid_len: int = 0) -> jnp.ndarray:
    """jnp oracle (also the fallback for exotic head dims / long sequences)."""
    b, s, three_e = qkv.shape
    e = three_e // 3
    d = e // num_heads
    q, k, v = qkv[..., :e], qkv[..., e:2 * e], qkv[..., 2 * e:]

    def split(t):
        return t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh.astype(jnp.float32),
                        kh.astype(jnp.float32)) / (d ** 0.5)
    valid = int(valid_len) or s
    if valid < s:
        keymask = (jnp.arange(s) < valid).reshape(1, 1, 1, s)
        scores = jnp.where(keymask, scores, -1e30)
    if causal:
        mask = jnp.triu(jnp.full((s, s), -1e30, jnp.float32), k=1)
        scores = scores + mask
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).reshape(b, s, e).astype(out_dtype)

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


def _softmax_group_size(s: int) -> int:
    """Heads per batched-softmax group: as many as keep the two stacked
    (G*S, S) f32 score/exp buffers within ~6 MB of VMEM (ViT-B: all 12;
    ViT-H: 8+8). ONE definition shared by the kernel and the wrapper's
    VMEM guard so the estimate always describes the kernel it gates."""
    return max(1, int(6 * 1024 * 1024 // (2 * 4 * s * s)))


def _mha_rows_kernel(x_ref, o_ref, *, num_heads: int, head_dim: int,
                     embed: int, scale: float, causal: bool,
                     valid_len: int):
    """bf16-scores kernel: ALL-HEADS batched softmax, exact for any logits.

    Round-4 measurement showed this kernel is VPU-bound, not MXU-bound: the
    softmax passes dominate (~0.45 of ~0.6 ms at ViT-B/16 shapes), and
    round-5 profiling showed WHY: per-head (S, S) arrays are only ~40k
    elements, so each of the 12 heads' mask/exp/reduce passes is mostly
    per-pass overhead, not element throughput. The round-5 redesign stacks
    every head's scores on the ROW axis — ``sc_all`` is (H*S, S) — so the
    mask, the per-row max reduce, the exp, and the sum reduce each run ONCE
    over 12x the elements. Same-process K-delta at ViT-B/16 b128 shapes:

    * round-4 fixed +60 clamp (silently flattens rows with logits > 60 —
      trained checkpoints hit this; REJECTED for correctness): 0.56 ms
    * per-head-loop softmax + exact per-row max: 0.71 ms
    * THIS kernel (batched softmax + exact per-row max): **0.55 ms** —
      exactness now costs nothing; it beats the broken clamp variant.

    Exactness: stability is the classic per-row max shift
    ``exp(sc - max(m, -80))`` with ``m`` the true masked row max (rows of
    ``sc_all`` are (head, query) pairs — softmax is per-row, so row-axis
    stacking changes nothing). The -80 floor keeps fully-masked pad rows
    finite (their max is -1e30; they underflow to zeros and the ``norm``
    guard avoids NaN — pad rows are discarded by the caller) while real
    rows stay exact for any row max >= -80; a row whose EVERY key scores
    below -80 (softmax weight < 2e-35 pre-shift) would need all |q.k| to
    be astronomically mis-scaled and degrades to zeros, not NaN.
    Masking is ONE ``min(sc_all, limit)``: +3e38 (no-op) on attendable
    keys, -1e30 on pad/causal-masked entries, (1, S) broadcast in the
    valid-len case and a (H*S, S)-consistent row-pattern (built from
    ``iota % S``) in the causal case. The 1/sum normalization stays on the
    (S, D) AV output rows, never on (S, S)."""
    h, d, e = num_heads, head_dim, embed
    x = x_ref[:]                                     # (S, 3E)
    s = x.shape[0]
    mm_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype

    g_max = _softmax_group_size(s)

    def group_limit(g):
        if causal:
            # (G*S, S) mask pattern: row r is query (r % S) of some head
            rows = jax.lax.broadcasted_iota(jnp.int32, (g * s, s), 0) % s
            cols = jax.lax.broadcasted_iota(jnp.int32, (g * s, s), 1)
            ok = cols <= rows
            if valid_len < s:
                ok = jnp.logical_and(ok, jnp.logical_and(cols < valid_len,
                                                         rows < valid_len))
            return jnp.where(ok, 3e38, -1e30).astype(jnp.float32)
        if valid_len < s:
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            return jnp.where(cols < valid_len, 3e38,
                             -1e30).astype(jnp.float32)
        return None

    limits = {}
    outs = [None] * h
    for h0 in range(0, h, g_max):
        heads = range(h0, min(h0 + g_max, h))
        g = len(heads)
        scs = []
        for hh in heads:
            qh = (x[:, hh * d:(hh + 1) * d].astype(jnp.float32) * scale)
            kh = x[:, e + hh * d:e + (hh + 1) * d]
            scs.append(jax.lax.dot_general(          # (S, S) f32
                qh.astype(mm_dtype), kh.astype(mm_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        sc_all = scs[0] if g == 1 else jnp.concatenate(scs, axis=0)
        if g not in limits:
            limits[g] = group_limit(g)
        if limits[g] is not None:
            sc_all = jnp.minimum(sc_all, limits[g])
        m = jnp.maximum(jnp.max(sc_all, axis=-1, keepdims=True), -80.0)
        ex_all = jnp.exp(sc_all - m)
        norm = jnp.maximum(jnp.sum(ex_all, axis=-1, keepdims=True), 1e-37)

        for gi, hh in enumerate(heads):
            vh = x[:, 2 * e + hh * d:2 * e + (hh + 1) * d]
            av = jax.lax.dot_general(                # (S, D) unnormalized
                ex_all[gi * s:(gi + 1) * s].astype(mm_dtype),
                vh.astype(mm_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs[hh] = av / norm[gi * s:(gi + 1) * s]
    o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _mha_rows_int8_kernel(x_ref, o_ref, *, num_heads: int, head_dim: int,
                          embed: int, scale: float, causal: bool,
                          valid_len: int):
    """int8-scores variant: QK^T and AV run as s8 MXU dots (394 vs 197
    TOPS on v5e, half the operand VMEM traffic at K=64).

    q/k/v are quantized IN-KERNEL with dynamic symmetric per-(image, head)
    absmax scales — nothing to calibrate or plumb: the reference's 7
    quantizers cover the projection *inputs* (``quantmultiheadattention.py:
    140-155``), not the projection outputs this kernel consumes, so scales
    are derived from the live block. Symmetric quantization keeps the dot
    zero-point-free. The softmax division is folded into the AV epilogue:
    ``out = sv * (exq @ v8 + cv*rowsum(exq)) / rowsum(exq)`` — the un-
    normalized exp weights are quantized to [0,127] directly and the
    normalizer is applied once per (row, head) instead of over (S, S).

    Tail-truncation bound: quantizing the row-max-anchored softmax weights
    to [0, 127] zeroes any probability below ~1/254 of the row's max, so a
    long flat tail loses its sub-0.4%-of-max mass (redistributed onto the
    surviving keys by the rowsum normalizer). Aggregate output error stays
    within int8 noise at ViT-length sequences — pinned by
    ``test_int8_scores_long_sequence_tail`` (S=200) and the S=16 case."""
    h, d, e = num_heads, head_dim, embed
    x = x_ref[:]                                     # (S, 3E)
    s = x.shape[0]

    def quant_sym(t):
        # dynamic symmetric s8: per-block absmax scale (f32 scalar)
        a = t.astype(jnp.float32)
        sc = jnp.maximum(jnp.max(jnp.abs(a)), 1e-12) / 127.0
        q = jnp.clip(jnp.round(a / sc), -127, 127).astype(jnp.int8)
        return q, sc

    need_mask = causal or valid_len < s
    if need_mask:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        ok = cols < valid_len
        if causal:
            ok = jnp.logical_and(ok, cols <= rows)

    outs = []
    for hh in range(h):
        q8, sq = quant_sym(x[:, hh * d:(hh + 1) * d])
        k8, sk = quant_sym(x[:, e + hh * d:e + (hh + 1) * d])
        v8, sv = quant_sym(x[:, 2 * e + hh * d:2 * e + (hh + 1) * d])
        scores = jax.lax.dot_general(                # (S, S) s32
            q8, k8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (sq * sk * scale)
        if need_mask:
            scores = jnp.where(ok, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        ex = jnp.exp(scores - m)                     # (S, S) in (0, 1]
        ex8 = jnp.round(ex * 127.0).astype(jnp.int8)  # [0, 127]
        norm = jnp.sum(ex8.astype(jnp.float32), axis=-1, keepdims=True)
        av = jax.lax.dot_general(                    # (S, D) s32
            ex8, v8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        outs.append(av * (sv / jnp.maximum(norm, 1.0)))
    o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _int8_scores_default() -> bool:
    """Kernel-variant default for the packed path. MEASURED default: OFF —
    the kernel is VPU-softmax-bound, and the int8 variant's in-kernel
    dynamic quantization adds VPU passes worth more than its MXU saving
    (0.85 vs 0.58 ms at ViT-B/16 shapes, docs/BENCH_NOTES.md round 4).
    ``QTPU_ATTN_INT8=1`` selects it for A/B."""
    import os

    return os.environ.get("QTPU_ATTN_INT8", "0") == "1"


def mha_fused_qkv_rows(qkv: jnp.ndarray, num_heads: int, seq_len: int,
                       causal: bool = False, out_dtype=None,
                       valid_len: int = 0,
                       int8_scores=None) -> jnp.ndarray:
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
        int8_scores: run QK^T/AV as dynamically-quantized s8 MXU dots
            (None = env default, see ``_int8_scores_default``).
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
    if int8_scores is None:
        int8_scores = _int8_scores_default()
    itemsize = jnp.dtype(qkv.dtype).itemsize
    # VMEM budget: input block + f32 head slices + the grouped stacked
    # (G*S, S) scores + exp buffers (the kernel caps the group's buffers
    # at ~6 MB itself) + the (G*S, S) f32 causal mask the kernel also
    # materializes + f32 out concat. ~12 MB of the ~16 MB/core VMEM,
    # else jnp fallback.
    g_eff = min(num_heads, _softmax_group_size(s))
    mask_bytes = (g_eff * s * s * 4 if causal
                  else (s * 4 if valid < s else 0))
    vmem_est = (s * three_e * itemsize          # input rows
                + 3 * s * d * 4                 # qh/kh/vh f32
                + 2 * g_eff * s * s * 4         # sc_all + ex_all f32
                + mask_bytes                    # limits[g]
                + s * e * (4 + itemsize))       # out concat + store
    if d % 8 != 0 or s % 8 != 0 or vmem_est > 12 * 1024 * 1024:
        return _mha_ref_rows(qkv, num_heads, s, causal, out_dtype, valid)

    kern = _mha_rows_int8_kernel if int8_scores else _mha_rows_kernel
    out = pl.pallas_call(
        functools.partial(kern, num_heads=num_heads, head_dim=d,
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

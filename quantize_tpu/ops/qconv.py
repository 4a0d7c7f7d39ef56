"""Fused dequantize-conv2d on the int8 MXU path.

Replaces the reference CUDA kernels ``quantconv2d.cu:50-146`` (int x int) and
``quantconv2d_float_input.cu:46-121`` (float x packed weight). XLA lowers
``conv_general_dilated(int8, int8) -> int32`` straight onto the MXU, so the
fused design is: quantize activations to int8 (VPU, fused), one int8 conv,
then an epilogue applying the zero-point corrections and per-channel rescale.

Zero-point algebra with SAME/explicit padding needs care: the int8 conv pads
with q=0, but a padded position must contribute *zero* to the float result
while a real q=0 position contributes ``z_a·s_a·ŵ``. The correction term
``z_a·Σ_valid w`` therefore varies near borders. It is computed exactly with
a cheap auxiliary conv of the validity mask against the ci-summed kernel
(cost ~1/C_in of the main conv, and only when z_a != 0):

    out = s_a·s_w·( conv(q_a, q_w) + z_a·conv(mask, Σ_ci q_w)
                    + z_w·conv(q_a, 1) + z_a·z_w·conv(mask, 1) ) + bias
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .pallas.qmatmul import quantize_act_int8

Padding = Union[str, Sequence[Tuple[int, int]]]


def _conv(x, w, strides, padding, groups=1, preferred=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, w, tuple(strides), padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def conv_zero_correction_map(
    w_int: jnp.ndarray,
    h: int,
    w_sp: int,
    strides: Sequence[int] = (1, 1),
    padding: Padding = "SAME",
) -> jnp.ndarray:
    """Precomputable z_a correction map ``conv(mask, Σ_ci w)`` (1,H',W',co).

    Depends only on the packed weight and the input spatial size, so it is
    computed once at pack time and added (scaled by z_a) in the epilogue —
    removing one conv per layer from every packed forward.
    """
    mask = jnp.ones((1, h, w_sp, 1), jnp.float32)
    w_ci_sum = jnp.sum(w_int.astype(jnp.float32), axis=2, keepdims=True)
    return _conv(mask, w_ci_sum, strides, padding)


def quant_conv2d(
    x: jnp.ndarray,
    a_scale: jnp.ndarray,
    a_zero: jnp.ndarray,
    a_qmin: int,
    a_qmax: int,
    w_int: jnp.ndarray,  # (kh, kw, ci/groups, co) int8
    w_scale: jnp.ndarray,  # (co,)
    w_zero: jnp.ndarray,  # (co,)
    bias: Optional[jnp.ndarray] = None,
    strides: Sequence[int] = (1, 1),
    padding: Padding = "SAME",
    groups: int = 1,
    w_zero_is_zero: bool = False,
    corr_a: Optional[jnp.ndarray] = None,
    pre_q: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused W8A8 conv2d (per-out-channel weight scales, per-tensor act).

    ``pre_q``: optionally the already-quantized input ``(q_int8, z_eff)`` —
    used by the int8-carry path where the caller shares the quantized
    activation with other consumers (``x`` is then only read for its shape).
    ``out_dtype``: cast the dequantized output (epilogue stays f32). The
    packed path passes the carry dtype so the tensor that MATERIALIZES at
    the fusion boundary is bf16, not f32 — on HBM-bound nets (MobileNetV2)
    f32 inter-op carries double the dominant traffic (BENCH_NOTES r4).
    """
    n, h, w_sp, _ = x.shape
    if pre_q is not None:
        q_a, z_eff = pre_q
    else:
        q_a, z_eff = quantize_act_int8(x, a_scale, a_zero, a_qmin, a_qmax)
        from ..nn.precision import packed_conv_barrier

        if packed_conv_barrier():
            # forbid XLA from output-fusing (and re-computing) the producer
            # chain into this conv's fusion — see set_packed_conv_barrier
            q_a = jax.lax.optimization_barrier(q_a)

    acc = _conv(q_a, w_int.astype(jnp.int8), strides, padding, groups,
                preferred=jnp.int32).astype(jnp.float32)

    # validity-mask conv for the z_a corrections (border-exact); use the
    # pack-time precomputed map when its spatial dims match
    if corr_a is None or corr_a.shape[1:3] != acc.shape[1:3]:
        corr_a = conv_zero_correction_map(w_int, h, w_sp, strides, padding)
    corrected = acc + z_eff * corr_a

    if not w_zero_is_zero:
        kh, kw, ci_g, co = w_int.shape
        mask = jnp.ones((1, h, w_sp, 1), jnp.float32)
        # Σ_valid q_a per output channel — grouped convs sum only their own
        # input slice, so use a per-group ones kernel
        ones_k = jnp.ones((kh, kw, ci_g, groups), jnp.float32)
        row_sum = _conv(q_a.astype(jnp.float32), ones_k, strides, padding,
                        groups=groups)  # (N,H',W',groups)
        row_sum = jnp.repeat(row_sum, co // groups, axis=-1)
        # z_a·z_w counts valid *elements*: taps × ci_g
        count = _conv(mask, jnp.ones((kh, kw, 1, 1), jnp.float32), strides, padding) * ci_g
        wz = w_zero.reshape(1, 1, 1, -1)
        corrected = corrected + wz * row_sum + z_eff * wz * count

    out = jnp.asarray(a_scale, jnp.float32) * w_scale.reshape(1, 1, 1, -1) * corrected
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype) if out_dtype is not None else out


def quant_conv2d_wo(
    x: jnp.ndarray,
    w_int: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_zero: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    strides: Sequence[int] = (1, 1),
    padding: Padding = "SAME",
    groups: int = 1,
    compute_dtype=jnp.float32,
    awq_recip: Optional[jnp.ndarray] = None,
    group_size: int = 0,
) -> jnp.ndarray:
    """Weight-only-quantized conv: dequantize weight (cheap, O(|W|)) and run
    the conv in float/bf16 — int storage halves/quarters weight HBM traffic;
    the ``quantconv2d_float_input`` analog.

    AWQ deploy (the conv analog of ``quant_matmul_wo``'s layouts): the packed
    kernel stores Q(w·awq); ``awq_recip`` (C_in,) folds the 1/awq in-channel
    divisor into the dequantized kernel. ``group_size`` > 0 selects the
    reference's ``q_group_size`` grid (``awq.py:119-121``): per-group
    scale/zero rows laid out exactly as the pack-time reshape
    ``w.T.reshape(-1, g)`` produced them (``nn/quantizer.py`` mode='pack')."""
    if group_size:
        # canonical group view: (kh,kw,in,out) -> 2-D (K, N) -> (N*K/g, g),
        # matching the AWQ observer's _group_view and the quantizer's pack
        n = w_int.shape[-1]
        flat = (w_int.astype(jnp.float32).reshape(-1, n).T
                .reshape(-1, group_size))
        s = jnp.asarray(w_scale, jnp.float32).reshape(-1, 1)
        z = jnp.asarray(w_zero, jnp.float32).reshape(-1, 1)
        w_deq = ((flat + z) * s).reshape(n, -1).T.reshape(w_int.shape)
    else:
        w_deq = (w_int.astype(jnp.float32) + w_zero) * w_scale
    if awq_recip is not None:
        # in-channel axis of HWIO is -2
        w_deq = w_deq * jnp.asarray(awq_recip, jnp.float32).reshape(-1, 1)
    out = _conv(x.astype(compute_dtype), w_deq.astype(compute_dtype),
                strides, padding, groups, preferred=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


# ---------------------------------------------------------------------------
# Space-to-depth stem transform (packed inference)
#
# A stride-2 KxK conv on few input channels (the ResNet 7x7x3 stem) wastes
# the MXU: C_in=3 leaves 125 of 128 K-lanes idle and the strided window
# halves spatial reuse. Rewriting it as a stride-1 ceil(K/2)^2 conv over a
# 2x2 space-to-depth input (C_in*4 channels) computes the *exact* same
# sums: the kernel is pre-padded to even size with zero rows/cols, so the
# extra taps contribute nothing, and padding geometry maps 1:1 onto block
# padding. The pack-time z_a correction map carries over unchanged (same
# output grid; padded taps have zero weight). Valid whenever stride == 2,
# (pad_before + kernel-pad) is even, and weight zero-points are exactly
# zero (the production symmetric-signed default) — asymmetric weights
# would need a recomputed row-sum geometry.
# ---------------------------------------------------------------------------

def space_to_depth(x: jnp.ndarray, s: int = 2) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/s, W/s, s*s*C); channel index (dy, dx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // s, w // s, s * s * c)


def s2d_kernel(w: jnp.ndarray, s: int = 2) -> jnp.ndarray:
    """(kh, kw, ci, co) -> (ceil(kh/s), ceil(kw/s), s*s*ci, co) with zero
    pre-padding; channel order matches :func:`space_to_depth`."""
    kh, kw, ci, co = w.shape
    ph, pw = (-kh) % s, (-kw) % s
    w = jnp.pad(w, ((ph, 0), (pw, 0), (0, 0), (0, 0)))
    kb_h, kb_w = (kh + ph) // s, (kw + pw) // s
    w = w.reshape(kb_h, s, kb_w, s, ci, co)
    w = w.transpose(0, 2, 1, 3, 4, 5)
    return w.reshape(kb_h, kb_w, s * s * ci, co)


def s2d_block_padding(kh: int, kw: int, pad, h: int, w: int, s: int = 2):
    """Block-space explicit padding equivalent to ``pad`` on the original
    stride-``s`` conv (kernel pre-padded per :func:`s2d_kernel`).

    Returns None when no exact block mapping exists (odd pad+kernel-pad
    alignment)."""
    (pht, phb), (pwt, pwb) = pad
    ph, pw = (-kh) % s, (-kw) % s
    if (pht + ph) % s or (pwt + pw) % s or h % s or w % s:
        return None
    out_h = (h + pht + phb - kh) // s + 1
    out_w = (w + pwt + pwb - kw) // s + 1
    pb_h, pb_w = (pht + ph) // s, (pwt + pw) // s
    kb_h, kb_w = (kh + ph) // s, (kw + pw) // s
    pa_h = max(0, (out_h - 1) - pb_h + kb_h - h // s)
    pa_w = max(0, (out_w - 1) - pb_w + kb_w - w // s)
    return [(pb_h, pa_h), (pb_w, pa_w)]

"""Quantized multi-head self-attention.

Covers the reference ``QuantMultiheadAttention``
(``modelzoo/modules/quantmultiheadattention.py:17``): seven quantizers —
q/k/v input activations (``:93-95``), q/k/v projection weights (``:106-108``),
and the out-projection weight whose range estimator is forced to MSE
(``:112-113``). The attention matmuls themselves run on the (de)quantized
projections in float, exactly like the reference's
``F.multi_head_attention_forward`` on simulated tensors; the out-projection
*input* is not quantized (reference has no quantizer there).

Composed from :class:`QuantDense` children, so calibrate / quant / pack /
packed modes all come from the dense layer's machinery (the packed path runs
all four projections on the fused int8 MXU kernels).
"""
from __future__ import annotations

from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..utils.config import dict_merge
from .layers import FP32, LayerQuantCfg, QuantDense


def _proj_cfg(quant: LayerQuantCfg, force_mse: bool = False,
              disable_act: bool = False) -> LayerQuantCfg:
    weight = dict(quant.weight)
    activation = dict(quant.activation)
    if force_mse:
        # reference forces the out-proj weight estimator to MSE
        rng_cfg = dict(weight.get("range") or {})
        if rng_cfg.get("name") != "awq":
            weight["range"] = dict_merge(rng_cfg, {"name": "mse"})
        else:
            weight["range"] = {"name": "mse"}
    if disable_act:
        activation = {"n_bits": 32}
    return LayerQuantCfg(weight=weight, activation=activation,
                         bias_correct=quant.bias_correct)


def _fused_qkv_packed(x, mods, pc: LayerQuantCfg, pre_norm=None):
    """Run the three q/k/v projections as ONE fused int8 matmul in packed
    mode (packed analog of the reference's fused ``in_proj_weight``,
    ``quantmultiheadattention.py:97-104``).

    q/k/v share the same quant config and the same input, so their
    activation qparams are identical and per-out-channel weight params
    concatenate exactly; fusing reads the activation once instead of three
    times and feeds the MXU one (K, 3N) matmul. With ``pre_norm`` (the
    deferred block LayerNorm's ``(scale, bias, eps)``), the normalize fuses
    into the activation quantize — int8 comes straight out of the Pallas LN
    kernel. Returns None when the layout isn't fusable (weight-only,
    per-channel activations, odd K for int4) — the caller falls back to
    per-projection execution."""
    from ..nn.precision import packed_carry_dtype
    from ..ops.pallas.layernorm import layernorm_quant_int8
    from ..ops.pallas.qmatmul import quant_matmul_w4a8, quant_matmul_w8a8
    from ..quant.qspec import QuantSpec

    w_spec = QuantSpec.from_config(dict(pc.weight), "weight", channel_axis=-1)
    a_spec = QuantSpec.from_config(dict(pc.activation), "activation", channel_axis=-1)
    if not (w_spec.enabled and a_spec.enabled and not a_spec.per_channel):
        return None
    if w_spec.range_name == "awq":
        return None  # AWQ deploys weight-only per projection
    bufs = [m.packed_proj_buffers() for m in mods]
    p4 = "w_p4" in bufs[0]
    w_key = "w_p4" if p4 else "w_int"
    if any(w_key not in b or "a_scale" not in b for b in bufs):
        return None
    W = jnp.concatenate([b[w_key] for b in bufs], axis=1)
    cat = lambda key: jnp.concatenate(  # noqa: E731
        [jnp.asarray(b[key]).reshape(-1) for b in bufs])
    w_scale, w_zero, bias, col_sum = (cat("w_scale"), cat("w_zero"),
                                      cat("bias"), cat("col_sum"))
    a_scale = bufs[0]["a_scale"].reshape(())
    a_zero = bufs[0]["a_zero"].reshape(())
    wz0 = bool(w_spec.symmetric and w_spec.qmin < 0)
    pre_q = None
    if pre_norm is not None:
        pre_q = layernorm_quant_int8(x, *pre_norm, a_scale, a_zero,
                                     a_spec.qmin, a_spec.qmax)
    fn = quant_matmul_w4a8 if p4 else quant_matmul_w8a8
    qkv = fn(x, a_scale, a_zero, a_spec.qmin, a_spec.qmax,
             W, w_scale, w_zero, bias, col_sum, w_zero_is_zero=wz0,
             pre_q=pre_q)
    return qkv.astype(packed_carry_dtype())  # (B, S, 3E)


class QuantMultiheadAttention(nn.Module):
    """Self-attention with quantized projections (batch, seq, embed)."""

    embed_dim: int
    num_heads: int
    quant: LayerQuantCfg = FP32
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mode: str = "fp32",
        mask: Optional[jnp.ndarray] = None,
        pre_norm=None,
        seq_len: Optional[int] = None,
        valid_len: int = 0,
    ) -> jnp.ndarray:
        assert self.embed_dim % self.num_heads == 0
        head_dim = self.embed_dim // self.num_heads
        # packed callers may pass 2-D (B*S, E) rows + a static seq_len: the
        # whole attention then runs without ever materializing a 3-D view
        # (S-misaligned (B, S, ...) reshapes are full relayouts on TPU —
        # measured 21% of the packed ViT-B/16 step, docs/BENCH_NOTES.md r3)
        rows_2d = x.ndim == 2
        if rows_2d:
            assert seq_len, "2-D attention input needs seq_len"
            s = int(seq_len)
            b = x.shape[0] // s
        else:
            b, s, _ = x.shape

        pc = _proj_cfg(self.quant)
        q_mod = QuantDense(self.embed_dim, use_bias=self.use_bias, quant=pc, name="q_proj")
        k_mod = QuantDense(self.embed_dim, use_bias=self.use_bias, quant=pc, name="k_proj")
        v_mod = QuantDense(self.embed_dim, use_bias=self.use_bias, quant=pc, name="v_proj")

        # mask: None | additive array | the string "causal"
        causal = isinstance(mask, str) and mask == "causal"

        fused = None
        if mode == "packed":
            fused = _fused_qkv_packed(x, (q_mod, k_mod, v_mod), pc, pre_norm)

        if mode == "packed" and (mask is None or causal):
            # fully fused attention middle: one Pallas kernel per batch row
            # block; scores/softmax never touch HBM
            from ..ops.pallas.attention import (mha_fused_qkv,
                                                mha_fused_qkv_rows)

            if fused is not None:
                qkv = fused
            else:
                if pre_norm is not None:
                    from ..ops.pallas.layernorm import layernorm

                    x = layernorm(x, *pre_norm, out_dtype=x.dtype)
                qkv = jnp.concatenate(
                    [q_mod(x, mode=mode), k_mod(x, mode=mode),
                     v_mod(x, mode=mode)], axis=-1)
            if rows_2d:
                out = mha_fused_qkv_rows(qkv, self.num_heads, s,
                                         causal=causal, out_dtype=qkv.dtype,
                                         valid_len=valid_len)
            else:
                out = mha_fused_qkv(qkv, self.num_heads, causal=causal,
                                    out_dtype=qkv.dtype)
        else:
            if fused is not None:
                n = self.embed_dim
                q, k, v = fused[..., :n], fused[..., n:2 * n], fused[..., 2 * n:]
            else:
                if pre_norm is not None:
                    from ..ops.pallas.layernorm import layernorm

                    x = layernorm(x, *pre_norm, out_dtype=x.dtype)
                q = q_mod(x, mode=mode)
                k = k_mod(x, mode=mode)
                v = v_mod(x, mode=mode)

            def split(t):
                return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(head_dim).astype(x.dtype)
            if causal:
                mask = jnp.triu(jnp.full((s, s), -jnp.inf, scores.dtype), k=1)
            elif mask is not None and rows_2d:
                # padded-rows caller with an array mask: it must already be
                # built for the PADDED length (a valid-length mask here would
                # silently misalign with the padded key axis)
                assert mask.shape[-1] == s, (
                    f"attention mask last dim {mask.shape[-1]} != padded "
                    f"seq_len {s}; build masks for the padded length")
            if mask is not None:
                scores = scores + mask
            if rows_2d and 0 < valid_len < s:
                # pad keys are never attended, matching the Pallas kernel
                keymask = (jnp.arange(s) < valid_len).reshape(1, 1, 1, s)
                scores = jnp.where(keymask, scores,
                                   jnp.asarray(-1e30, scores.dtype))
            attn = nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
            out = out.transpose(0, 2, 1, 3)
            out = (out.reshape(b * s, self.embed_dim) if rows_2d
                   else out.reshape(b, s, self.embed_dim))

        oc = _proj_cfg(self.quant, force_mse=True, disable_act=True)
        return QuantDense(self.embed_dim, use_bias=self.use_bias, quant=oc, name="out_proj")(out, mode=mode)

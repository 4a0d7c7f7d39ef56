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
    ) -> jnp.ndarray:
        assert self.embed_dim % self.num_heads == 0
        head_dim = self.embed_dim // self.num_heads
        b, s, _ = x.shape

        pc = _proj_cfg(self.quant)
        q = QuantDense(self.embed_dim, use_bias=self.use_bias, quant=pc, name="q_proj")(x, mode=mode)
        k = QuantDense(self.embed_dim, use_bias=self.use_bias, quant=pc, name="k_proj")(x, mode=mode)
        v = QuantDense(self.embed_dim, use_bias=self.use_bias, quant=pc, name="v_proj")(x, mode=mode)

        def split(t):
            return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(head_dim).astype(x.dtype)
        if mask is not None:
            scores = scores + mask
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.embed_dim)

        oc = _proj_cfg(self.quant, force_mse=True, disable_act=True)
        return QuantDense(self.embed_dim, use_bias=self.use_bias, quant=oc, name="out_proj")(out, mode=mode)

"""LayerNorm with a fused Pallas fast path for packed inference.

Drop-in replacement for ``nn.LayerNorm`` at transformer block boundaries:
identical parameter names/shapes (``scale``/``bias``) so checkpoints and
importers are unaffected, identical math in fp32/quant/calibrate modes (LN
stays differentiable for QAT), and a single-pass Pallas kernel in packed
mode (:mod:`quantize_tpu.ops.pallas.layernorm`) where flax's lowering was
the measured ViT bottleneck.

``params_tuple()`` exposes the raw arrays so a consumer layer can fuse the
normalize into its activation quantization (LN -> int8 directly, no bf16
round-trip through HBM).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pallas.layernorm import _ln_math, layernorm


class FusedLayerNorm(nn.Module):
    features: int
    epsilon: float = 1e-6
    dtype: Optional[Any] = None  # packed-mode output (carry) dtype

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(),
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.features,))

    def __call__(self, x: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        if mode == "packed":
            return layernorm(x, self.scale, self.bias, self.epsilon,
                             out_dtype=self.dtype or x.dtype)
        # training/simulation modes: plain XLA math (differentiable), f32
        # statistics, flax-compatible output dtype
        y = _ln_math(x.astype(jnp.float32),
                     self.scale.astype(jnp.float32),
                     self.bias.astype(jnp.float32), self.epsilon)
        return y.astype(x.dtype) if x.dtype != jnp.float32 else y

    def params_tuple(self):
        """(scale, bias, eps) for consumers that fuse LN into their own
        quantization (see ``QuantDense``/``QuantMultiheadAttention``
        ``pre_norm``)."""
        return self.scale, self.bias, self.epsilon

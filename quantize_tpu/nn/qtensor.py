"""Quantized activation carrier for the packed inference path.

``QTensor`` holds an int8 activation tensor together with its (per-tensor)
quantization parameters in the *shifted* convention used on the int8 MXU
path (:func:`quantize_tpu.ops.pallas.qmatmul.quantize_act_int8`):

    dequant(q) = (q + z_eff) * scale

With int8 inter-layer carry enabled (:mod:`quantize_tpu.nn.precision`),
residual blocks reuse the main-path conv's quantized input for their skip
and downsample branches instead of the float tensor. Every consumer of a
block-boundary activation then reads the *same* int8 tensor — XLA's output
fusion ends the producer chain at the int8 quantize, so the tensor that
round-trips through HBM is int8 (4x smaller than f32, 2x smaller than bf16
carries). The skip path consequently sees the activation-quantized value
(== ``fake_quant(x)`` with the conv's act params) — a change covered by
accuracy tests, mirroring the bf16-carry tradeoff.

No reference analog: the reference packed path dequantized to f32 between
every layer (``quantconv2d.py:198-210``).
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class QTensor:
    """int8 activation + per-tensor qparams (shifted zero convention)."""

    q: jnp.ndarray  # int8
    scale: jnp.ndarray  # f32 scalar
    z_eff: jnp.ndarray  # f32 scalar; dequant = (q + z_eff) * scale

    def dequant(self, dtype=jnp.float32) -> jnp.ndarray:
        """Elementwise dequantize — fuses into whatever consumes it."""
        out = (self.q.astype(jnp.float32) + self.z_eff) * self.scale
        return out.astype(dtype)

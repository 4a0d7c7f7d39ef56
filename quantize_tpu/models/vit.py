"""Quantization-aware Vision Transformer (torchvision-compatible).

Covers the reference ViT zoo (``modelzoo/transformers/vision_transformer.py:
8-16``): vit_b_16/32, vit_l_16/32, vit_h_14. Quantized modules mirror what
the reference's surgery reaches: the patch-embedding conv (``nn_conv2d``),
every MLP linear (``nn_linear``), the attention blocks
(``nn_multiheadattention``), and the classification head; LayerNorms stay in
float. Layer paths follow torchvision naming so regex-scoped overrides work:
``/conv_proj``, ``/encoder/layers/encoder_layer_0/self_attention``, ...
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.attention import QuantMultiheadAttention
from ..nn.intercept import QuantCtx
from ..nn.layers import QuantConv, QuantDense
from ..nn.norm import FusedLayerNorm
from ..nn.precision import packed_carry_dtype


def _compute_dtype(mode: str):
    """Packed inference computes float glue ops (LayerNorm, residuals,
    embeddings) in the carry dtype so inter-layer HBM traffic stays halved;
    other modes keep flax's default f32 promotion."""
    return packed_carry_dtype() if mode == "packed" else None


class MLPBlock(nn.Module):
    ctx: QuantCtx
    qpath: str
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32",
                 pre_norm=None) -> jnp.ndarray:
        x = QuantDense(self.hidden_dim, quant=self.ctx.resolve(f"{self.qpath}/0", "nn_linear"),
                       name="linear1")(x, mode=mode, pre_norm=pre_norm)
        # packed inference uses the tanh-approx GELU: exact erf profiled at
        # ~1.6 ms/block on v5e (a pure-VPU transcendental over 77M elems) and
        # the approximation error (~1e-3 rel) is far below the int8
        # activation-quantization noise of the matmul that consumes it.
        # Simulation/QAT modes keep exact erf (torchvision parity).
        x = nn.gelu(x, approximate=(mode == "packed"))
        return QuantDense(self.out_dim, quant=self.ctx.resolve(f"{self.qpath}/3", "nn_linear"),
                          name="linear2")(x, mode=mode)


class EncoderBlock(nn.Module):
    ctx: QuantCtx
    qpath: str
    num_heads: int
    hidden_dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32",
                 seq_len: int = 0, valid_len: int = 0) -> jnp.ndarray:
        dt = _compute_dtype(mode)
        ln_1 = FusedLayerNorm(self.hidden_dim, epsilon=1e-6, dtype=dt, name="ln_1")
        ln_2 = FusedLayerNorm(self.hidden_dim, epsilon=1e-6, dtype=dt, name="ln_2")
        attn = QuantMultiheadAttention(
            self.hidden_dim, self.num_heads,
            quant=self.ctx.resolve(f"{self.qpath}/self_attention", "nn_multiheadattention"),
            name="self_attention",
        )
        mlp = MLPBlock(self.ctx, f"{self.qpath}/mlp", self.mlp_dim,
                       self.hidden_dim, name="mlp")
        if mode == "packed":
            # defer each LayerNorm into its consumer: the Pallas LN kernel
            # fuses with the consumer's int8 activation quantize, so the
            # normalized tensor never round-trips through HBM. The carry is
            # 2-D (B*S, E) rows — see VisionTransformer.
            x = x + attn(x, mode=mode, pre_norm=ln_1.params_tuple(),
                         seq_len=seq_len, valid_len=valid_len)
            return x + mlp(x, mode=mode, pre_norm=ln_2.params_tuple())
        x = x + attn(ln_1(x, mode), mode=mode)
        return x + mlp(ln_2(x, mode), mode=mode)


class VisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    num_layers: int = 12
    num_heads: int = 12
    hidden_dim: int = 768
    mlp_dim: int = 3072
    num_classes: int = 1000
    ctx: QuantCtx = QuantCtx.fp32()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        del train
        n = x.shape[0]
        x = QuantConv(
            self.hidden_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            quant=self.ctx.resolve("/conv_proj", "nn_conv2d"), name="conv_proj",
        )(x, mode=mode)
        x = x.reshape(n, -1, self.hidden_dim)  # (N, patches, D)

        cls = self.param("class_token", nn.initializers.zeros, (1, 1, self.hidden_dim))
        dt = _compute_dtype(mode)
        if dt is not None:
            cls = cls.astype(dt)
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.hidden_dim)).astype(x.dtype), x], axis=1)
        seq_len = x.shape[1]
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, seq_len, self.hidden_dim))
        x = x + (pos.astype(dt) if dt is not None else pos)

        packed = mode == "packed"
        s_pad = seq_len
        if packed:
            # 2-D (B*S, E) carry through the whole encoder: S=197 is not
            # sublane-aligned, so every (B, S, E) <-> (B*S, E) reshape is a
            # full relayout on TPU — device traces showed them costing ~21%
            # of the step. One pad+relayout here, zero inside the encoder.
            # S pads to the sublane multiple; pad KEYS are masked inside the
            # attention kernel (valid_len), pad query rows carry garbage that
            # every rowwise op keeps isolated and the cls gather drops.
            s_pad = -(-seq_len // 8) * 8
            if s_pad != seq_len:
                x = jnp.pad(x, ((0, 0), (0, s_pad - seq_len), (0, 0)))
            x = x.reshape(n * s_pad, self.hidden_dim)

        for i in range(self.num_layers):
            x = EncoderBlock(
                self.ctx, f"/encoder/layers/encoder_layer_{i}",
                self.num_heads, self.hidden_dim, self.mlp_dim,
                name=f"encoder_layer_{i}",
            )(x, mode=mode, seq_len=s_pad, valid_len=seq_len)
        x = FusedLayerNorm(self.hidden_dim, epsilon=1e-6,
                           dtype=_compute_dtype(mode), name="ln")(x, mode)
        # class-token rows: stride-S slice in 2-D, plain index in 3-D
        x = x[::s_pad] if packed else x[:, 0]
        return QuantDense(self.num_classes, quant=self.ctx.resolve("/heads/head", "nn_linear"),
                          name="head")(x, mode=mode)


def _make_vit(patch, layers, heads, hidden, mlp, image_size=224):
    def ctor(num_classes: int = 1000, ctx: Optional[QuantCtx] = None, **kw):
        return VisionTransformer(
            image_size=kw.pop("image_size", image_size), patch_size=patch,
            num_layers=layers, num_heads=heads, hidden_dim=hidden, mlp_dim=mlp,
            num_classes=num_classes, ctx=ctx or QuantCtx.fp32(), **kw,
        )

    return ctor


vit_b_16 = _make_vit(16, 12, 12, 768, 3072)
vit_b_32 = _make_vit(32, 12, 12, 768, 3072)
vit_l_16 = _make_vit(16, 24, 16, 1024, 4096)
vit_l_32 = _make_vit(32, 24, 16, 1024, 4096)
vit_h_14 = _make_vit(14, 32, 16, 1280, 5120)

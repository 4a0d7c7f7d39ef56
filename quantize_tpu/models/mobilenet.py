"""Quantization-aware MobileNet family (NHWC).

Covers the reference zoo entries (``modelzoo/cnns/mobilenet/__init__.py:8-16``
and the custom V1 at ``modelzoo/cnns/mobilenet/mobilenetv1.py:44-107``):
mobilenet_v1, mobilenet_v2, mobilenet_v3_small/large. Depthwise convs map to
``feature_group_count == channels`` and are quantized per-out-channel like
any other conv.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.intercept import QuantCtx
from ..nn.layers import QuantDense
from ..nn.precision import packed_qin_carry
from .resnet import _ConvBN


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return relu6(x + 3.0) / 6.0


def hard_swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * hard_sigmoid(x)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class MobileNetV1(nn.Module):
    """Reference custom MobileNetV1 (``mobilenetv1.py:44-107``)."""

    num_classes: int = 1000
    ctx: QuantCtx = QuantCtx.fp32()

    # (out_channels, stride) for the 13 depthwise-separable blocks
    CFG: Sequence[Tuple[int, int]] = (
        (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
        (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1),
    )

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        x = _ConvBN(ctx, "/model/0/0", 32, (3, 3), (2, 2),
                    name_conv="stem_conv", name_bn="stem_bn")(x, mode, train)
        x = nn.relu(x)
        in_ch = 32
        for i, (out_ch, stride) in enumerate(self.CFG):
            base = f"/model/{i + 1}"
            x = _ConvBN(ctx, f"{base}/0", in_ch, (3, 3), (stride, stride), groups=in_ch,
                        name_conv=f"dw{i}_conv", name_bn=f"dw{i}_bn")(x, mode, train)
            x = nn.relu(x)
            x = _ConvBN(ctx, f"{base}/3", out_ch, (1, 1),
                        name_conv=f"pw{i}_conv", name_bn=f"pw{i}_bn")(x, mode, train)
            x = nn.relu(x)
            in_ch = out_ch
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, quant=ctx.resolve("/fc", "nn_linear"), name="fc")(x, mode=mode)


class InvertedResidual(nn.Module):
    ctx: QuantCtx
    qpath: str
    in_ch: int
    out_ch: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        hidden = int(round(self.in_ch * self.expand_ratio))
        use_res = self.stride == 1 and self.in_ch == self.out_ch
        # int8 carry: the residual branch reuses the first conv's quantized
        # input so the block boundary materializes as int8 (nn/qtensor.py)
        use_qin = use_res and mode == "packed" and packed_qin_carry()
        identity = x
        out = x
        qin = None
        idx = 0
        if self.expand_ratio != 1:
            out = _ConvBN(ctx, f"{self.qpath}/conv/{idx}/0", hidden, (1, 1),
                          name_conv="expand_conv", name_bn="expand_bn",
                          return_qinput=use_qin)(out, mode, train)
            if use_qin:
                out, qin = out
            out = relu6(out)
            idx += 1
        out = _ConvBN(ctx, f"{self.qpath}/conv/{idx}/0", hidden, (3, 3),
                      (self.stride, self.stride), groups=hidden,
                      name_conv="dw_conv", name_bn="dw_bn",
                      return_qinput=use_qin and idx == 0)(out, mode, train)
        if use_qin and idx == 0:
            out, qin = out
        out = relu6(out)
        out = _ConvBN(ctx, f"{self.qpath}/conv/{idx + 1}", self.out_ch, (1, 1),
                      name_conv="project_conv", name_bn="project_bn")(out, mode, train)
        if qin is not None:
            identity = qin.dequant()
        return identity + out if use_res else out


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    ctx: QuantCtx = QuantCtx.fp32()

    # t (expand), c (channels), n (repeats), s (stride)
    CFG: Sequence[Tuple[int, int, int, int]] = (
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
    )

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        in_ch = _make_divisible(32 * self.width_mult)
        x = _ConvBN(ctx, "/features/0/0", in_ch, (3, 3), (2, 2),
                    name_conv="stem_conv", name_bn="stem_bn")(x, mode, train)
        x = relu6(x)
        feat_idx = 1
        for t, c, n, s in self.CFG:
            out_ch = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    ctx, f"/features/{feat_idx}", in_ch, out_ch,
                    s if i == 0 else 1, t, name=f"features_{feat_idx}",
                )(x, mode, train)
                in_ch = out_ch
                feat_idx += 1
        last_ch = _make_divisible(1280 * max(1.0, self.width_mult))
        x = _ConvBN(ctx, f"/features/{feat_idx}/0", last_ch, (1, 1),
                    name_conv="head_conv", name_bn="head_bn")(x, mode, train)
        x = relu6(x)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(
            self.num_classes, quant=ctx.resolve("/classifier/1", "nn_linear"), name="classifier",
        )(x, mode=mode)


class SqueezeExcite(nn.Module):
    ctx: QuantCtx
    qpath: str
    channels: int
    squeeze: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = _SEConv(self.ctx, f"{self.qpath}/fc1", self.squeeze, name="fc1")(s, mode)
        s = nn.relu(s)
        s = _SEConv(self.ctx, f"{self.qpath}/fc2", self.channels, name="fc2")(s, mode)
        return x * hard_sigmoid(s)


class _SEConv(nn.Module):
    """1x1 conv with bias (no BN) used inside SE blocks."""

    ctx: QuantCtx
    qpath: str
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32") -> jnp.ndarray:
        from ..nn.layers import QuantConv

        return QuantConv(
            self.features, (1, 1), use_bias=True,
            quant=self.ctx.resolve(self.qpath, "nn_conv2d"), name="conv",
        )(x, mode=mode)


class MNV3Block(nn.Module):
    ctx: QuantCtx
    qpath: str
    in_ch: int
    exp_ch: int
    out_ch: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        act = hard_swish if self.use_hs else nn.relu
        use_res = self.stride == 1 and self.in_ch == self.out_ch
        use_qin = use_res and mode == "packed" and packed_qin_carry()
        identity = x
        out = x
        qin = None
        idx = 0
        if self.exp_ch != self.in_ch:
            out = _ConvBN(ctx, f"{self.qpath}/block/{idx}/0", self.exp_ch, (1, 1),
                          name_conv="expand_conv", name_bn="expand_bn",
                          return_qinput=use_qin)(out, mode, train)
            if use_qin:
                out, qin = out
            out = act(out)
            idx += 1
        out = _ConvBN(ctx, f"{self.qpath}/block/{idx}/0", self.exp_ch,
                      (self.kernel, self.kernel), (self.stride, self.stride),
                      groups=self.exp_ch, name_conv="dw_conv", name_bn="dw_bn",
                      return_qinput=use_qin and idx == 0)(out, mode, train)
        if use_qin and idx == 0:
            out, qin = out
        out = act(out)
        idx += 1
        if qin is not None:
            identity = qin.dequant()
        if self.use_se:
            out = SqueezeExcite(ctx, f"{self.qpath}/block/{idx}", self.exp_ch,
                                _make_divisible(self.exp_ch // 4), name="se")(out, mode)
            idx += 1
        out = _ConvBN(ctx, f"{self.qpath}/block/{idx}/0", self.out_ch, (1, 1),
                      name_conv="project_conv", name_bn="project_bn")(out, mode, train)
        return identity + out if use_res else out


_V3_LARGE = [
    # k, exp, out, se, hs, s
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]

_V3_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]


class MobileNetV3(nn.Module):
    num_classes: int = 1000
    small: bool = False
    ctx: QuantCtx = QuantCtx.fp32()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        cfg = _V3_SMALL if self.small else _V3_LARGE
        x = _ConvBN(ctx, "/features/0/0", 16, (3, 3), (2, 2),
                    name_conv="stem_conv", name_bn="stem_bn")(x, mode, train)
        x = hard_swish(x)
        in_ch = 16
        for i, (k, exp, out_ch, se, hs, s) in enumerate(cfg):
            x = MNV3Block(ctx, f"/features/{i + 1}", in_ch, exp, out_ch, k, s, se, hs,
                          name=f"features_{i + 1}")(x, mode, train)
            in_ch = out_ch
        head_ch = 576 if self.small else 960
        x = _ConvBN(ctx, f"/features/{len(cfg) + 1}/0", head_ch, (1, 1),
                    name_conv="head_conv", name_bn="head_bn")(x, mode, train)
        x = hard_swish(x)
        x = jnp.mean(x, axis=(1, 2))
        mid = 1024 if self.small else 1280
        x = QuantDense(mid, quant=ctx.resolve("/classifier/0", "nn_linear"), name="pre_classifier")(x, mode=mode)
        x = hard_swish(x)
        return QuantDense(self.num_classes, quant=ctx.resolve("/classifier/3", "nn_linear"), name="classifier")(x, mode=mode)


def mobilenet_v1(num_classes: int = 1000, ctx: Optional[QuantCtx] = None, **kw):
    return MobileNetV1(num_classes=num_classes, ctx=ctx or QuantCtx.fp32(), **kw)


def mobilenet_v2(num_classes: int = 1000, ctx: Optional[QuantCtx] = None, **kw):
    return MobileNetV2(num_classes=num_classes, ctx=ctx or QuantCtx.fp32(), **kw)


def mobilenet_v3_large(num_classes: int = 1000, ctx: Optional[QuantCtx] = None, **kw):
    return MobileNetV3(num_classes=num_classes, small=False, ctx=ctx or QuantCtx.fp32(), **kw)


def mobilenet_v3_small(num_classes: int = 1000, ctx: Optional[QuantCtx] = None, **kw):
    return MobileNetV3(num_classes=num_classes, small=True, ctx=ctx or QuantCtx.fp32(), **kw)

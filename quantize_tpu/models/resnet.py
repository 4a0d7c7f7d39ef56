"""Quantization-aware ResNet family (NHWC, TPU layouts).

Covers the reference's CNN zoo entries backed by torchvision
(``modelzoo/cnns/resnet.py:8-21``): resnet18/34/50/101/152, resnext50_32x4d,
resnext101_32x8d/64x4d, wide_resnet50_2/101_2 — built quantization-aware from
config instead of post-hoc surgery. Layer paths mirror the reference's
slash-joined module paths (``/layer1/0/conv1``) so regex-scoped config
overrides behave identically (``modelzoo/reconstruct.py:44-91``).

When ``ctx.bn_folding_enabled`` the BatchNorms after each conv are *absent*
from the module tree — their parameters are folded into the conv weights (or
the weight-quantizer static_scale) at import time, matching
``quantconv2d.py:115-133``. Otherwise inference-mode BatchNorm layers are kept.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.intercept import QuantCtx
from ..nn.layers import QuantConv, QuantDense
from ..nn.precision import packed_fused_residual, packed_qin_carry


class _BN(nn.Module):
    """Inference-style BatchNorm (running stats), used when BN is not folded."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)


def _conv_kind(ctx: QuantCtx) -> str:
    return "nn_conv2d_bn2d" if ctx.bn_folding_enabled else "nn_conv2d"


def _fuse_residual(ctx: QuantCtx, mode: str) -> bool:
    """Gate for the fused conv+residual+ReLU packed epilogue: requires folded
    BN (nothing between conv and add) and a plain (non-act-quantized) ReLU."""
    return (mode == "packed" and packed_fused_residual()
            and ctx.bn_folding_enabled
            and not ctx.act_layer_enabled("nn_relu"))


def _relu(ctx: QuantCtx, qpath: str, x, mode: str, name: str = "relu"):
    """ReLU site: plain by default; an explicit ``nn_relu`` config key flips
    it to the activation-quantized :class:`QuantReLU` (the reference's
    commented-out surgery path, ``reconstruct.py:123-129``)."""
    if ctx.act_layer_enabled("nn_relu"):
        from ..nn.layers import QuantReLU

        return QuantReLU(quant=ctx.resolve(qpath, "nn_relu"), name=name)(x, mode=mode)
    return nn.relu(x)


class _ConvBN:
    """Conv (+ BN when not folded) helper shared by all blocks.

    Deliberately NOT an ``nn.Module``: the :class:`QuantConv`/:class:`_BN` it
    creates attach to the *calling* module's scope, so parameter paths stay
    flat (``layer1_0/conv1``, not ``layer1_0/_ConvBN_0/conv1``) and mirror
    the reference's torch module naming — which the checkpoint importers
    (:mod:`~quantize_tpu.models.import_resnet` et al.) rely on.
    """

    def __init__(self, ctx: QuantCtx, qpath: str, features: int,
                 kernel_size: Sequence[int], strides: Sequence[int] = (1, 1),
                 groups: int = 1, name_conv: str = "conv", name_bn: str = "bn",
                 return_qinput: bool = False, s2d: bool = False):
        self.ctx = ctx
        self.qpath = qpath
        self.features = features
        self.kernel_size = kernel_size
        self.strides = strides
        self.groups = groups
        self.name_conv = name_conv
        self.name_bn = name_bn
        # packed int8-carry: expose conv's quantized input
        self.return_qinput = return_qinput
        # packed space-to-depth stem rewrite
        self.s2d = s2d

    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False,
                 residual=None, fuse_relu: bool = False):
        ctx = self.ctx
        pad = [(k // 2, k // 2) for k in self.kernel_size]
        x = QuantConv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=False,
            quant=ctx.resolve(self.qpath, _conv_kind(ctx)),
            name=self.name_conv,
            return_qinput=self.return_qinput and mode == "packed",
            s2d=self.s2d,
        )(x, mode=mode, residual=residual, fuse_relu=fuse_relu)
        qin = None
        if self.return_qinput:
            if mode == "packed":
                x, qin = x
        if not ctx.bn_folding_enabled:
            x = _BN(name=self.name_bn)(x, train=train)
        return (x, qin) if self.return_qinput else x


class BasicBlock(nn.Module):
    ctx: QuantCtx
    qpath: str
    features: int
    strides: Sequence[int] = (1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        # int8 carry: skip/downsample reuse conv1's quantized input so the
        # block-boundary activation materializes once, as int8 (qtensor.py)
        use_qin = mode == "packed" and packed_qin_carry()
        out = _ConvBN(self.ctx, f"{self.qpath}/conv1", self.features, (3, 3), self.strides,
                      name_conv="conv1", name_bn="bn1",
                      return_qinput=use_qin)(x, mode, train)
        qin = None
        if use_qin:
            out, qin = out
        identity = x if qin is None else qin.dequant()
        out = _relu(self.ctx, f"{self.qpath}/relu", out, mode, name="relu1")
        if self.downsample:
            identity = _ConvBN(self.ctx, f"{self.qpath}/downsample/0", self.features, (1, 1),
                               self.strides, name_conv="downsample_conv",
                               name_bn="downsample_bn")(identity, mode, train)
        conv2 = _ConvBN(self.ctx, f"{self.qpath}/conv2", self.features, (3, 3),
                        name_conv="conv2", name_bn="bn2")
        if _fuse_residual(self.ctx, mode):
            # 3x3 conv: the Pallas 1x1 kernel doesn't apply, but the layer's
            # unfused residual tail still fuses add+relu with the epilogue
            return conv2(out, mode, train, residual=identity, fuse_relu=True)
        out = conv2(out, mode, train)
        return _relu(self.ctx, f"{self.qpath}/relu", out + identity, mode, name="relu2")


class Bottleneck(nn.Module):
    ctx: QuantCtx
    qpath: str
    features: int  # bottleneck width (conv1/conv2 channels)
    out_features: int  # expansion * planes
    strides: Sequence[int] = (1, 1)
    groups: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        use_qin = mode == "packed" and packed_qin_carry()
        out = _ConvBN(self.ctx, f"{self.qpath}/conv1", self.features, (1, 1),
                      name_conv="conv1", name_bn="bn1",
                      return_qinput=use_qin)(x, mode, train)
        qin = None
        if use_qin:
            out, qin = out
        identity = x if qin is None else qin.dequant()
        out = _relu(self.ctx, f"{self.qpath}/relu", out, mode, name="relu1")
        out = _ConvBN(self.ctx, f"{self.qpath}/conv2", self.features, (3, 3), self.strides,
                      groups=self.groups, name_conv="conv2", name_bn="bn2")(out, mode, train)
        out = _relu(self.ctx, f"{self.qpath}/relu", out, mode, name="relu2")
        if self.downsample:
            identity = _ConvBN(self.ctx, f"{self.qpath}/downsample/0", self.out_features, (1, 1),
                               self.strides, name_conv="downsample_conv",
                               name_bn="downsample_bn")(identity, mode, train)
        conv3 = _ConvBN(self.ctx, f"{self.qpath}/conv3", self.out_features, (1, 1),
                        name_conv="conv3", name_bn="bn3")
        if _fuse_residual(self.ctx, mode):
            # conv3 + skip add + ReLU fused into one Pallas kernel: the fat
            # block-boundary activation is written to HBM exactly once
            return conv3(out, mode, train, residual=identity, fuse_relu=True)
        out = conv3(out, mode, train)
        return _relu(self.ctx, f"{self.qpath}/relu", out + identity, mode, name="relu3")


class ResNet(nn.Module):
    """Torchvision-compatible ResNet/ResNeXt/WideResNet trunk."""

    stage_sizes: Sequence[int]
    bottleneck: bool
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    stem_width: int = 64
    # packed inference rewrites the 7x7/s2 stem as a stride-1 4x4 conv over
    # a 2x2 space-to-depth input (exact math, much better MXU utilization
    # at C_in=3); no effect on other modes or on checkpoints
    stem_s2d: bool = True
    ctx: QuantCtx = QuantCtx.fp32()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        x = _ConvBN(ctx, "/conv1", self.stem_width, (7, 7), (2, 2),
                    name_conv="conv1", name_bn="bn1",
                    s2d=self.stem_s2d)(x, mode, train)
        x = _relu(ctx, "/relu", x, mode, name="relu")
        if ctx.act_layer_enabled("nn_maxpool2d"):
            from ..nn.layers import QuantMaxPool

            x = QuantMaxPool(window=(3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)],
                             quant=ctx.resolve("/maxpool", "nn_maxpool2d"),
                             name="maxpool")(x, mode=mode)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        expansion = 4 if self.bottleneck else 1
        in_ch = self.stem_width
        for stage, n_blocks in enumerate(self.stage_sizes):
            planes = 64 * (2**stage)
            width = int(planes * (self.width_per_group / 64.0)) * self.groups
            out_ch = planes * expansion
            for b in range(n_blocks):
                strides = (2, 2) if (stage > 0 and b == 0) else (1, 1)
                path = f"/layer{stage + 1}/{b}"
                needs_ds = b == 0 and (strides != (1, 1) or in_ch != out_ch)
                if self.bottleneck:
                    x = Bottleneck(
                        ctx, path, width, out_ch, strides, self.groups, needs_ds,
                        name=f"layer{stage + 1}_{b}",
                    )(x, mode, train)
                else:
                    x = BasicBlock(
                        ctx, path, planes, strides, needs_ds,
                        name=f"layer{stage + 1}_{b}",
                    )(x, mode, train)
                in_ch = out_ch

        if ctx.act_layer_enabled("nn_adaptiveavgpool2d"):
            from ..nn.layers import QuantGlobalAvgPool

            x = QuantGlobalAvgPool(
                quant=ctx.resolve("/avgpool", "nn_adaptiveavgpool2d"),
                name="avgpool")(x, mode=mode)
        else:
            x = jnp.mean(x, axis=(1, 2))
        x = QuantDense(
            features=self.num_classes,
            quant=ctx.resolve("/fc", "nn_linear"),
            name="fc",
        )(x, mode=mode)
        return x


def _make(stage_sizes, bottleneck, **kw) -> Callable[..., ResNet]:
    def ctor(num_classes: int = 1000, ctx: Optional[QuantCtx] = None, **extra: Any) -> ResNet:
        return ResNet(
            stage_sizes=stage_sizes, bottleneck=bottleneck, num_classes=num_classes,
            ctx=ctx or QuantCtx.fp32(), **{**kw, **extra},
        )

    return ctor


resnet18 = _make([2, 2, 2, 2], False)
resnet34 = _make([3, 4, 6, 3], False)
resnet50 = _make([3, 4, 6, 3], True)
resnet101 = _make([3, 4, 23, 3], True)
resnet152 = _make([3, 8, 36, 3], True)
resnext50_32x4d = _make([3, 4, 6, 3], True, groups=32, width_per_group=4)
resnext101_32x8d = _make([3, 4, 23, 3], True, groups=32, width_per_group=8)
resnext101_64x4d = _make([3, 4, 23, 3], True, groups=64, width_per_group=4)
wide_resnet50_2 = _make([3, 4, 6, 3], True, width_per_group=128)
wide_resnet101_2 = _make([3, 4, 23, 3], True, width_per_group=128)

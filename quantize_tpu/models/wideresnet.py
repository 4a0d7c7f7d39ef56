"""Pre-activation WideResNet (CIFAR), quantization-aware.

Covers the reference's custom WRN-28/40 (``modelzoo/cnns/wideresnet.py:56``)
and the RobustBench ``rb_wrn-28-10`` entry (``modelzoo/cnns/robustbench.py:
13-16`` — same WRN-28-10 architecture; RobustBench weights are imported
from a user-provided torch checkpoint, as this environment has no egress).

BN-folding subtlety: in pre-activation blocks BN precedes conv in module
order, so the reference's sibling-pair folding folds ``bn2`` into ``conv1``
(the BN that *follows* conv1 in the dataflow) and leaves each block's
``bn1`` as a live BatchNorm; ``conv2`` stays unfolded. This implementation
reproduces that exact fold topology when ``bn_folding`` is on.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.intercept import QuantCtx
from ..nn.layers import QuantConv, QuantDense
from .resnet import _BN, _conv_kind


class WRNBasicBlock(nn.Module):
    ctx: QuantCtx
    qpath: str
    in_planes: int
    out_planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        equal = self.in_planes == self.out_planes
        folded = ctx.bn_folding_enabled

        pre = _BN(name="bn1")(x, train=train)
        pre = nn.relu(pre)
        inp = pre if equal else pre  # pre-activation feeds both paths when not equal

        # conv1 (+bn2 folded into it when bn_folding is on — the reference's
        # sibling-pair fold, reconstruct.py:106-110 applied to preact order)
        out = QuantConv(
            self.out_planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False,
            quant=ctx.resolve(f"{self.qpath}/conv1", _conv_kind(ctx)), name="conv1",
        )(inp if not equal else pre, mode=mode)
        if not folded:
            out = _BN(name="bn2")(out, train=train)
        out = nn.relu(out)
        out = QuantConv(
            self.out_planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            quant=ctx.resolve(f"{self.qpath}/conv2", "nn_conv2d"), name="conv2",
        )(out, mode=mode)

        if equal:
            shortcut = x
        else:
            shortcut = QuantConv(
                self.out_planes, (1, 1), strides=(self.stride, self.stride),
                padding="VALID", use_bias=False,
                quant=ctx.resolve(f"{self.qpath}/convShortcut", "nn_conv2d"),
                name="convShortcut",
            )(pre, mode=mode)
        return shortcut + out


class WideResNet(nn.Module):
    depth: int = 28
    widen_factor: int = 10
    num_classes: int = 10
    ctx: QuantCtx = QuantCtx.fp32()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        widths = [16, 16 * self.widen_factor, 32 * self.widen_factor, 64 * self.widen_factor]

        x = QuantConv(widths[0], (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                      quant=ctx.resolve("/conv1", "nn_conv2d"), name="conv1")(x, mode=mode)
        in_planes = widths[0]
        for stage in range(3):
            out_planes = widths[stage + 1]
            stride = 1 if stage == 0 else 2
            for b in range(n):
                x = WRNBasicBlock(
                    ctx, f"/block{stage + 1}/layer/{b}", in_planes, out_planes,
                    stride if b == 0 else 1, name=f"block{stage + 1}_{b}",
                )(x, mode=mode, train=train)
                in_planes = out_planes
        x = _BN(name="bn1")(x, train=train)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, quant=ctx.resolve("/fc", "nn_linear"),
                          name="fc")(x, mode=mode)


def wideresnet28(num_classes: int = 10, ctx: Optional[QuantCtx] = None, **kw):
    return WideResNet(depth=28, widen_factor=kw.pop("widen_factor", 10),
                      num_classes=num_classes, ctx=ctx or QuantCtx.fp32(), **kw)


def wideresnet40(num_classes: int = 10, ctx: Optional[QuantCtx] = None, **kw):
    return WideResNet(depth=40, widen_factor=kw.pop("widen_factor", 2),
                      num_classes=num_classes, ctx=ctx or QuantCtx.fp32(), **kw)


def rb_wrn_28_10(num_classes: int = 10, ctx: Optional[QuantCtx] = None, **kw):
    """RobustBench 'Standard' WRN-28-10 architecture (weights via torch
    checkpoint import)."""
    return wideresnet28(num_classes=num_classes, ctx=ctx, **kw)

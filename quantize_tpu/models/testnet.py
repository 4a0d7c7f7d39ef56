"""A tiny CNN for fast CPU-runnable end-to-end tests.

No reference counterpart — the reference has no test suite at all
(SURVEY.md §4); this model exists so the PTQ/QAT/AdaRound pipelines can be
regression-tested in seconds on the 8-device CPU mesh.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.intercept import QuantCtx
from ..nn.layers import QuantConv, QuantDense
from .resnet import _BN, _conv_kind


class TrajNet(nn.Module):
    """Mirror of the golden-trajectory fixture net
    (``scripts/gen_golden_traj.py::TrajNet``): biased conv(3->8,s2) -> relu
    -> conv(8->16,s2) -> relu -> GAP -> fc, no BN. The reference's
    ``reconstruct`` maps exactly its three conv/linear modules to quant
    modules (``modelzoo/reconstruct.py:106-117``); the plain relus mirror
    the commented-out ReLU surgery (``:123-129``)."""

    num_classes: int = 10
    ctx: QuantCtx = QuantCtx.fp32()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        kind = _conv_kind(ctx)
        x = QuantConv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                      use_bias=True, quant=ctx.resolve("/conv1", kind),
                      name="conv1")(x, mode=mode)
        x = nn.relu(x)
        x = QuantConv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                      use_bias=True, quant=ctx.resolve("/conv2", kind),
                      name="conv2")(x, mode=mode)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, quant=ctx.resolve("/fc", "nn_linear"),
                          name="fc")(x, mode=mode)


class TestCNN(nn.Module):
    num_classes: int = 10
    width: int = 16
    ctx: QuantCtx = QuantCtx.fp32()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "fp32", train: bool = False) -> jnp.ndarray:
        ctx = self.ctx
        kind = _conv_kind(ctx)
        x = QuantConv(self.width, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                      use_bias=False, quant=ctx.resolve("/conv1", kind), name="conv1")(x, mode=mode)
        if not ctx.bn_folding_enabled:
            x = _BN(name="bn1")(x, train=train)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = QuantConv(self.width * 2, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, quant=ctx.resolve("/conv2", kind), name="conv2")(x, mode=mode)
        if not ctx.bn_folding_enabled:
            x = _BN(name="bn2")(x, train=train)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = QuantDense(32, quant=ctx.resolve("/fc1", "nn_linear"), name="fc1")(x, mode=mode)
        x = nn.relu(x)
        return QuantDense(self.num_classes, quant=ctx.resolve("/fc2", "nn_linear"), name="fc2")(x, mode=mode)

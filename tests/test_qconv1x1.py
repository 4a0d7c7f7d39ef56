"""Fused 1x1-conv + residual + ReLU Pallas kernel (ops/pallas/qconv1x1.py).

Cross-checks the kernel against the unfused reference path
(ops/qconv.py::quant_conv2d followed by add + relu) and validates the
packed ResNet forward with the fusion flag on vs off.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.deploy import pack_model
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.nn.precision import fused_residual, packed_carry
from quantize_tpu.ops.pallas.qconv1x1 import conv1x1_residual
from quantize_tpu.ops.qconv import quant_conv2d


def _cfg():
    return {"default": {
        "weight": {"n_bits": 8, "symmetric": True, "signed": True,
                   "granularity": "channel", "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True}}


@pytest.mark.parametrize("shape,k,co", [
    ((2, 8, 8), 64, 256),     # bottleneck expand shape class
    ((1, 7, 7), 512, 128),    # K > sublane tile, odd spatial
    ((3, 5, 6), 48, 96),      # nothing aligned: M, K, Co all ragged
])
@pytest.mark.parametrize("relu", [True, False])
def test_kernel_matches_unfused_reference(shape, k, co, relu):
    rng = np.random.default_rng(0)
    n, h, w_sp = shape
    q_a = jnp.asarray(rng.integers(-128, 128, size=(n, h, w_sp, k), dtype=np.int64).astype(np.int8))
    w_int = jnp.asarray(rng.integers(-127, 128, size=(1, 1, k, co), dtype=np.int64).astype(np.int8))
    w_scale = jnp.asarray(rng.uniform(0.001, 0.02, size=(co,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(n, h, w_sp, co)).astype(np.float32))
    a_scale = jnp.float32(0.013)
    z_eff = jnp.float32(127.4)  # shifted-zero convention (unsigned act grid)

    x_dummy = jnp.zeros((n, h, w_sp, k), jnp.float32)
    ref = quant_conv2d(
        x_dummy, a_scale, jnp.float32(0.0), -128, 127,
        w_int, w_scale, jnp.zeros((co,), jnp.float32), bias,
        strides=(1, 1), padding=[(0, 0), (0, 0)],
        w_zero_is_zero=True, pre_q=(q_a, z_eff))
    ref = ref + res
    if relu:
        ref = jax.nn.relu(ref)

    out = conv1x1_residual(q_a, z_eff, a_scale, w_int, w_scale, bias, res,
                           relu=relu, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_kernel_bf16_out_and_no_bias():
    rng = np.random.default_rng(1)
    q_a = jnp.asarray(rng.integers(-128, 128, size=(2, 4, 4, 64), dtype=np.int64).astype(np.int8))
    w_int = jnp.asarray(rng.integers(-127, 128, size=(64, 128), dtype=np.int64).astype(np.int8))
    w_scale = jnp.full((128,), 0.01, jnp.float32)
    res = jnp.asarray(rng.normal(size=(2, 4, 4, 128)).astype(np.float32)).astype(jnp.bfloat16)
    out = conv1x1_residual(q_a, jnp.float32(0.0), jnp.float32(0.02),
                           w_int, w_scale, None, res, relu=True)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (2, 4, 4, 128)
    assert float(jnp.min(out)) >= 0.0


@pytest.mark.parametrize("model_name", ["resnet50", "resnet18"])
def test_packed_forward_fused_flag(model_name):
    """Flag on vs off: same predictions, logits to int8-noise level.

    resnet50 exercises the Pallas 1x1 kernel (bottleneck conv3); resnet18
    exercises the 3x3 fallback tail (add+relu fused into the conv epilogue).
    """
    model = MODELS.build(model_name, num_classes=10, ctx=QuantCtx(_cfg()))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    deploy = pack_model(model, variables, x)

    out_ref = model.apply(deploy, x, mode="packed")
    with fused_residual(True):
        out_fused = model.apply(deploy, x, mode="packed")
    a, b = np.asarray(out_ref), np.asarray(out_fused)
    denom = np.maximum(np.abs(a).max(), 1e-6)
    # same math, f32 epilogue: tight agreement expected
    assert np.max(np.abs(a - b)) / denom < 1e-3
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))

    # bf16 carries (the serving configuration) with the fusion on
    with packed_carry(jnp.bfloat16), fused_residual(True):
        out_bf16 = model.apply(deploy, x, mode="packed")
    c = np.asarray(out_bf16, np.float32)
    # bf16 carries round the block boundary once more than the unfused
    # order of operations; logits must stay at bf16-noise level (argmax on
    # random-init near-tied logits is not stable under that noise)
    assert np.max(np.abs(a - c)) / denom < 0.05

    # simulation mode unaffected by the flag
    sim = model.apply(variables, x, mode="quant")
    with fused_residual(True):
        sim2 = model.apply(variables, x, mode="quant")
    np.testing.assert_array_equal(np.asarray(sim), np.asarray(sim2))

"""Packed-path carry precision: bf16 inter-layer carries must track the f32
packed forward to ~int8-noise level and preserve predictions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.deploy import pack_model
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.nn.precision import packed_carry, packed_carry_dtype


def _cfg():
    return {"default": {
        "weight": {"n_bits": 8, "symmetric": True, "signed": True,
                   "granularity": "channel", "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True}}


def test_bf16_carry_matches_f32_carry():
    model = MODELS.build("testcnn", num_classes=10, ctx=QuantCtx(_cfg()))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    deploy = pack_model(model, variables, x)

    out_f32 = model.apply(deploy, x, mode="packed")
    assert out_f32.dtype == jnp.float32

    with packed_carry(jnp.bfloat16):
        assert packed_carry_dtype() == jnp.bfloat16
        out_bf16 = model.apply(deploy, x, mode="packed")
    assert out_bf16.dtype == jnp.bfloat16
    assert packed_carry_dtype() == jnp.float32  # context restored

    a, b = np.asarray(out_f32), np.asarray(out_bf16, np.float32)
    # logits agree to bf16/int8-noise level and predictions are identical
    denom = np.maximum(np.abs(a).max(), 1e-6)
    assert np.max(np.abs(a - b)) / denom < 0.05
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))


def test_qtensor_dequant_matches_fake_quant():
    """dequant(quantize_act_int8(x)) == fake_quant(x) with the same qparams —
    the exact invariant the int8 skip-path carry relies on."""
    from quantize_tpu.nn.qtensor import QTensor
    from quantize_tpu.ops.pallas.qmatmul import quantize_act_int8
    from quantize_tpu.quant.fakequant import fake_quant

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 7, 7, 16)).astype(np.float32) * 3)
    for qmin, qmax, scale, zero in [(0, 255, 0.031, -97.3), (-128, 127, 0.05, 0.0)]:
        s = jnp.float32(scale)
        z = jnp.float32(zero)
        q, z_eff = quantize_act_int8(x, s, z, qmin, qmax)
        qt = QTensor(q=q, scale=s, z_eff=z_eff)
        expected = fake_quant(x, s, z, qmin, qmax)
        np.testing.assert_allclose(np.asarray(qt.dequant()), np.asarray(expected),
                                   rtol=0, atol=1e-5)


@pytest.mark.slow
def test_int8_qin_carry_resnet():
    """int8 quantized-domain carry on a residual model: skip paths consume
    the main conv's quantized input; logits stay at int8-noise level and
    predictions are preserved vs the plain packed forward."""
    from quantize_tpu.nn.precision import qin_carry

    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(_cfg()))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    deploy = pack_model(model, variables, x)

    out_ref = model.apply(deploy, x, mode="packed")
    with qin_carry(True):
        out_qin = model.apply(deploy, x, mode="packed")

    a, b = np.asarray(out_ref), np.asarray(out_qin)
    denom = np.maximum(np.abs(a).max(), 1e-6)
    assert np.max(np.abs(a - b)) / denom < 0.08, (a - b)
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))

    # simulation mode must be unaffected by the flag
    sim = model.apply(variables, x, mode="quant")
    with qin_carry(True):
        sim2 = model.apply(variables, x, mode="quant")
    np.testing.assert_array_equal(np.asarray(sim), np.asarray(sim2))


@pytest.mark.slow
def test_int8_qin_carry_mobilenet_v2():
    """Inverted-residual (expand-first and no-expand first-block) topologies."""
    from quantize_tpu.nn.precision import qin_carry

    model = MODELS.build("mobilenet_v2", num_classes=10, ctx=QuantCtx(_cfg()))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    deploy = pack_model(model, variables, x)

    out_ref = model.apply(deploy, x, mode="packed")
    with qin_carry(True):
        out_qin = model.apply(deploy, x, mode="packed")
    a, b = np.asarray(out_ref), np.asarray(out_qin)
    denom = np.maximum(np.abs(a).max(), 1e-6)
    assert np.max(np.abs(a - b)) / denom < 0.08
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))

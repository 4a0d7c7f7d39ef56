"""Packed-path carry precision: bf16 inter-layer carries must track the f32
packed forward to ~int8-noise level and preserve predictions."""
import jax
import jax.numpy as jnp
import numpy as np

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

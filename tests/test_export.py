"""StableHLO export round trip."""
import jax
import jax.numpy as jnp
import numpy as np

from quantize_tpu.deploy import pack_model
from quantize_tpu.export import export_forward, export_mlir_text, load_exported
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx

W8A8 = {
    "default": {
        "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True,
    }
}


def test_export_packed_roundtrip():
    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(W8A8))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    deploy = pack_model(model, variables, x)

    payload = export_forward(model, deploy, x, mode="packed")
    assert isinstance(payload, (bytes, bytearray)) and len(payload) > 1000

    fn = load_exported(payload)
    out = fn(x)
    ref = model.apply(deploy, x, mode="packed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_export_mlir_text_mentions_int8():
    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(W8A8))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    deploy = pack_model(model, variables, x)
    text = export_mlir_text(model, deploy, x, mode="packed")
    assert "i8" in text  # integer weights made it into the graph

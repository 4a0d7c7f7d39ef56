"""Orbax checkpoint round trip incl. packed integer planes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.checkpoint import restore, save
from quantize_tpu.deploy import pack_model
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.parallel import make_mesh

W8A8 = {
    "default": {
        "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True,
    }
}


@pytest.mark.slow
def test_orbax_roundtrip_with_packed(tmp_path):
    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(W8A8))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    deploy = pack_model(model, variables, x)

    path = str(tmp_path / "ckpt")
    save(path, deploy)
    back = restore(path)
    ref = model.apply(deploy, x, mode="packed")
    out = model.apply(back, x, mode="packed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    # sharded restore onto an 8-device mesh
    mesh = make_mesh(dp=2, tp=4)
    back_sharded = restore(path, mesh=mesh)
    out2 = model.apply(back_sharded, x, mode="packed")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-5, atol=1e-5)

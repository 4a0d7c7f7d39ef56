"""GSPMD sharding: packed weights tensor-shard; sharded forward == local."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from quantize_tpu.deploy import pack_model
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.parallel import make_mesh, shard_variables, spec_for_variables

W8A8 = {
    "default": {
        "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True,
    }
}


def _packed_testcnn():
    model = MODELS.build("testcnn", num_classes=8, ctx=QuantCtx(W8A8))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    return model, variables, pack_model(model, variables, x), x


def test_packed_weights_get_model_sharding():
    model, variables, deploy, x = _packed_testcnn()
    specs = spec_for_variables(deploy, tp=4)
    # conv int8 weights shard on out-channel
    conv_spec = specs["packed"]["conv2"]["w_int"]
    assert conv_spec == P(None, None, None, "model")
    fc_spec = specs["packed"]["fc1"]["w_int"]
    assert fc_spec == P(None, "model")
    assert specs["packed"]["fc1"]["w_scale"] == P("model")


def test_sharded_packed_forward_matches_local():
    model, variables, deploy, x = _packed_testcnn()
    ref = model.apply(deploy, x, mode="packed")

    mesh = make_mesh(dp=2, tp=4)
    deploy_sharded = shard_variables(mesh, deploy)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))

    @jax.jit
    def fwd(v, img):
        return model.apply(v, img, mode="packed")

    out = fwd(deploy_sharded, x_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_sharded_quant_sim_forward_matches_local():
    model, variables, deploy, x = _packed_testcnn()
    ref = model.apply(variables, x, mode="quant")
    mesh = make_mesh(dp=4, tp=2)
    vs = shard_variables(mesh, variables)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))

    @jax.jit
    def fwd(v, img):
        return model.apply(v, img, mode="quant")

    out = fwd(vs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

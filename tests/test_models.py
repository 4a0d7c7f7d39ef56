"""Model zoo construction + forward shape checks (small inputs for speed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx

W8A8 = {
    "default": {
        "weight": {"n_bits": 8, "symmetric": True, "signed": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "maminmax", "momentum": 0.1}},
        "bn_folding": True,
    }
}


def test_resnet18_fp32_forward():
    model = MODELS.build("resnet18", num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 10)


def test_resnet18_quantized_calibrate_and_eval():
    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W8A8))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    # with bn_folding enabled there must be no BatchNorm state
    assert "batch_stats" not in variables
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    y_q = model.apply(variables, x, mode="quant")
    y_fp = model.apply(variables, x, mode="fp32")
    assert y_q.shape == (2, 10)
    rel = float(jnp.linalg.norm(y_q - y_fp) / (jnp.linalg.norm(y_fp) + 1e-9))
    assert rel < 0.3  # random weights, just sanity


@pytest.mark.slow
def test_resnet50_bottleneck_shapes():
    model = MODELS.build("resnet50", num_classes=7)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (1, 7)


@pytest.mark.parametrize("name", [
    "mobilenet_v1",
    pytest.param("mobilenet_v2", marks=pytest.mark.slow),
    pytest.param("mobilenet_v3_small", marks=pytest.mark.slow),
])
def test_mobilenets_forward(name):
    model = MODELS.build(name, num_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (1, 5)


def test_unfolded_bn_variant_has_batch_stats():
    cfg = {k: dict(v) for k, v in W8A8.items()}
    cfg["default"] = dict(cfg["default"], bn_folding=False)
    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(cfg))
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, mode="calibrate")
    assert "batch_stats" in variables


def test_testcnn_quant_pipeline():
    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(W8A8))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16, 16, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    y = model.apply(variables, x, mode="quant")
    assert y.shape == (4, 4) and np.isfinite(np.asarray(y)).all()


def test_wideresnet_quant_forward():
    model = MODELS.build("wideresnet28", num_classes=10, ctx=QuantCtx(W8A8), widen_factor=2)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    # pre-activation WRN keeps its bn1 BatchNorms even with bn_folding on
    assert "batch_stats" in variables
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    y = model.apply(variables, x, mode="quant")
    assert y.shape == (2, 10) and np.isfinite(np.asarray(y)).all()


def test_public_api_workflow():
    """The package-root workflow (README/USAGE contract): build -> init ->
    calibrate -> quant sim -> pack -> packed forward, all via lazy
    top-level exports."""
    import numpy as np

    import quantize_tpu as qt

    cfg = {"default": {
        "weight": {"n_bits": 8, "symmetric": True, "signed": True,
                   "granularity": "channel", "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True}}
    model = qt.MODELS.build("testcnn", num_classes=4, ctx=qt.QuantCtx(cfg))
    rng = np.random.default_rng(0)
    xs = [rng.normal(size=(2, 16, 16, 3)).astype(np.float32) for _ in range(2)]
    v = qt.init_model(model, xs[0])
    v = qt.calibrate_model(model, v, [xs[0], {"img": xs[1]}])
    sim = np.asarray(model.apply(v, xs[0], mode="quant"))
    deploy = qt.pack_model(model, v, xs[0])
    packed = np.asarray(model.apply(deploy, xs[0], mode="packed"), np.float32)
    assert sim.shape == packed.shape == (2, 4)
    assert np.isfinite(sim).all() and np.isfinite(packed).all()
    assert (np.argmax(sim, -1) == np.argmax(packed, -1)).mean() >= 0.5
    # on this tiny model, per-layer packed metadata outweighs the weight
    # savings — just check the accounting runs on both trees
    assert qt.model_size_bytes(deploy) > 0 and qt.model_size_bytes(v) > 0
    assert "calibrate_model" in dir(qt)  # lazy __dir__ works

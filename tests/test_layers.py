"""Linen quantized-layer plumbing: calibrate -> quant -> fp32 modes."""
import jax
import jax.numpy as jnp
import numpy as np

from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.nn.layers import LayerQuantCfg, QuantConv, QuantDense, QuantReLU


def w8a8_cfg(**kw):
    d = dict(
        weight={"n_bits": 8, "symmetric": True, "signed": True, "granularity": "channel",
                "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "maminmax", "momentum": 0.1}},
    )
    d.update(kw)
    return LayerQuantCfg(**d)


def calibrated_apply(model, x, n_batches=1):
    key = jax.random.PRNGKey(0)
    variables = dict(model.init(key, x, mode="calibrate"))
    variables.pop("taps", None)
    for _ in range(n_batches):
        _, updates = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
        variables = {**variables, **updates}
    return variables


def test_dense_calibrate_then_quant_close_to_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    model = QuantDense(features=8, quant=w8a8_cfg())
    variables = calibrated_apply(model, x)

    y_fp = model.apply(variables, x, mode="fp32")
    y_q = model.apply(variables, x, mode="quant")
    assert y_q.shape == (16, 8)
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    assert rel < 0.05  # W8A8 should be close


def test_calibrate_mode_output_is_fp32():
    """During calibration the forward stays unquantized (reference runs
    calibration with quantized=False, runner/ptq.py:51-63)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    model = QuantDense(features=4, quant=w8a8_cfg())
    variables = model.init(jax.random.PRNGKey(0), x, mode="calibrate")
    y_cal, _ = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    y_fp = model.apply(variables, x, mode="fp32")
    np.testing.assert_allclose(np.asarray(y_cal), np.asarray(y_fp), rtol=1e-6)


def test_fp32_spec_is_passthrough():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    model = QuantDense(features=4)  # default FP32 cfg
    variables = model.init(jax.random.PRNGKey(0), x)
    y1 = model.apply(variables, x, mode="fp32")
    y2 = model.apply(variables, x, mode="quant")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_conv_quant_close_to_fp32():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    model = QuantConv(features=16, kernel_size=(3, 3), quant=w8a8_cfg())
    variables = calibrated_apply(model, x)
    y_fp = model.apply(variables, x, mode="fp32")
    y_q = model.apply(variables, x, mode="quant")
    assert y_q.shape == y_fp.shape == (2, 16, 16, 16)
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    assert rel < 0.05


def test_per_channel_weight_scale_shape():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    model = QuantConv(features=12, kernel_size=(3, 3), quant=w8a8_cfg())
    variables = calibrated_apply(model, x)
    scale = variables["qparams"]["w_quantizer"]["scale"]
    assert scale.shape == (12,)
    a_scale = variables["qparams"]["a_quantizer"]["scale"]
    assert a_scale.shape == (1,)


def test_bias_correct_reduces_output_bias():
    """W4 + bias_correct: mean output error should shrink vs no correction."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(loc=0.7, size=(32, 16)).astype(np.float32))
    cfg_plain = LayerQuantCfg(
        weight={"n_bits": 4, "symmetric": True, "granularity": "layer",
                "range": {"name": "minmax"}},
        activation={"n_bits": 32},
    )
    cfg_bc = LayerQuantCfg(weight=dict(cfg_plain.weight), activation={"n_bits": 32},
                           bias_correct={"momentum": 1.0})
    m_plain = QuantDense(features=8, quant=cfg_plain)
    m_bc = QuantDense(features=8, quant=cfg_bc)

    v_plain = calibrated_apply(m_plain, x)
    v_bc = calibrated_apply(m_bc, x)
    # share identical weights
    v_bc = {**v_bc, "params": jax.tree.map(lambda a: a, v_plain["params"])}

    y_fp = m_plain.apply(v_plain, x, mode="fp32")
    err_plain = float(jnp.abs(jnp.mean(m_plain.apply(v_plain, x, mode="quant") - y_fp)))
    err_bc = float(jnp.abs(jnp.mean(m_bc.apply(v_bc, x, mode="quant") - y_fp)))
    assert err_bc <= err_plain + 1e-6


def test_awq_layer_calibration():
    rng = np.random.default_rng(6)
    x = jnp.asarray((rng.normal(size=(8, 16)) * 10 ** rng.uniform(-1, 1, 16)).astype(np.float32))
    cfg = LayerQuantCfg(
        weight={"n_bits": 4, "symmetric": True, "granularity": "channel",
                "range": {"name": "awq", "grid": 8}},
        activation={"n_bits": 32},
    )
    model = QuantDense(features=4, quant=cfg)
    variables = calibrated_apply(model, x)
    assert "awq_scale" in variables["qparams"]["w_quantizer"]
    y = model.apply(variables, x, mode="quant")
    assert np.isfinite(np.asarray(y)).all()


def test_taps_collection_captures_outputs():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    model = QuantDense(features=4, quant=w8a8_cfg())
    variables = calibrated_apply(model, x)
    y, state = model.apply(variables, x, mode="quant", mutable=["taps"])
    taps = state["taps"]["out"]
    np.testing.assert_allclose(np.asarray(taps[0]), np.asarray(y))


def test_quant_ctx_regex_override():
    cfg_quant = {
        "default": {
            "weight": {"n_bits": 8}, "activation": {"n_bits": 8}, "bn_folding": True,
        },
        "nn_linear": {"weight": {"n_bits": 4}},
        "/layer1/.*": {"activation": {"n_bits": 16}},
    }
    ctx = QuantCtx(cfg_quant)
    base = ctx.resolve("/conv1", "nn_conv2d_bn2d")
    assert dict(base.weight)["n_bits"] == 8
    lin = ctx.resolve("/fc", "nn_linear")
    assert dict(lin.weight)["n_bits"] == 4
    scoped = ctx.resolve("/layer1/0/conv2", "nn_conv2d_bn2d")
    assert dict(scoped.activation)["n_bits"] == 16
    assert ctx.bn_folding_enabled


def test_quant_relu():
    x = jnp.asarray(np.random.default_rng(8).normal(size=(4, 8, 8, 4)).astype(np.float32))
    cfg = LayerQuantCfg(activation={"n_bits": 8, "symmetric": False,
                                    "range": {"name": "minmax"}})
    model = QuantReLU(quant=cfg)
    variables = model.init(jax.random.PRNGKey(0), x, mode="calibrate")
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    y = model.apply(variables, x, mode="quant")
    assert float(jnp.min(y)) >= 0.0


def test_awq_grouped_layer_quant():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    cfg = LayerQuantCfg(
        weight={"n_bits": 4, "symmetric": True, "granularity": "channel",
                "range": {"name": "awq", "grid": 6, "q_group_size": 8}},
        activation={"n_bits": 32},
    )
    model = QuantDense(features=4, quant=cfg)
    variables = calibrated_apply(model, x)
    scale = variables["qparams"]["w_quantizer"]["scale"]
    assert scale.shape == (32 * 4 // 8,)
    y = model.apply(variables, x, mode="quant")
    assert np.isfinite(np.asarray(y)).all()


def test_cross_entropy_estimator_in_layer():
    """Classifier-head activation quantizer with the CE estimator (the
    reference's cross_entropy config, configs/runners/ptq/cross_entropy)."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(16, 10)).astype(np.float32))
    cfg = LayerQuantCfg(
        weight={"n_bits": 8, "symmetric": True, "granularity": "channel",
                "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "cross_entropy", "grid": 10}},
    )
    model = QuantDense(features=4, quant=cfg)
    variables = calibrated_apply(model, x)
    y = model.apply(variables, x, mode="quant")
    assert np.isfinite(np.asarray(y)).all()


def test_awq_pack_matches_sim():
    """AWQ packed deploy (Q(w*awq) ints + 1/awq folded into dequant) must
    reproduce the simulated forward (closes the reference's latent
    AWQ-cannot-pack limitation, quantizer.py:228-246)."""
    from quantize_tpu.deploy import pack_model

    for group in (0, 8):
        rng = np.random.default_rng(20 + group)
        x = jnp.asarray((rng.normal(size=(8, 32)) * 10 ** rng.uniform(-1, 1, 32)).astype(np.float32))
        wcfg = {"n_bits": 4, "symmetric": True, "granularity": "channel",
                "range": {"name": "awq", "grid": 8}}
        if group:
            wcfg["range"] = {"name": "awq", "grid": 8, "q_group_size": group}
        cfg = LayerQuantCfg(
            weight=wcfg,
            activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                        "range": {"name": "minmax"}},
        )
        model = QuantDense(features=4, quant=cfg)
        variables = calibrated_apply(model, x)
        y_sim = model.apply(variables, x, mode="quant")
        deploy = pack_model(model, variables, x)
        assert "awq_recip" in deploy["packed"], "AWQ reciprocal must be stored"
        y_packed = model.apply(deploy, x, mode="packed")
        np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim),
                                   rtol=2e-4, atol=2e-4)

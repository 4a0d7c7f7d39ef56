"""Packed (deploy) inference path vs fake-quant simulation.

The key contract: packed integer inference computes the same math as the
fake-quant simulation (up to f32 epilogue rounding) — the reference never
achieved this (its fused CUDA path was disabled, ``quantconv2d.py:204-206``);
here it is the primary path and must be provably equivalent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.deploy import model_size_bytes, pack_model
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.nn.layers import LayerQuantCfg, QuantConv, QuantDense


def calibrated(model, x, seed=0):
    variables = dict(model.init(jax.random.PRNGKey(seed), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    return {**variables, **upd}


def cfg_w8a8():
    return LayerQuantCfg(
        weight={"n_bits": 8, "symmetric": True, "signed": True, "granularity": "channel",
                "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )


def cfg_w4a8():
    c = cfg_w8a8()
    return LayerQuantCfg(weight=dict(dict(c.weight), n_bits=4), activation=dict(c.activation))


def cfg_w4_only():
    return LayerQuantCfg(
        weight={"n_bits": 4, "symmetric": True, "granularity": "channel",
                "range": {"name": "minmax"}},
        activation={"n_bits": 32},
    )


@pytest.mark.parametrize("cfg_fn", [cfg_w8a8, cfg_w4a8, cfg_w4_only])
def test_dense_packed_matches_sim(cfg_fn):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    model = QuantDense(features=32, quant=cfg_fn())
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")
    _, upd = model.apply(variables, x, mode="pack", mutable=["packed"])
    vp = {**variables, **upd}
    y_packed = model.apply(vp, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("cfg_fn", [cfg_w8a8, cfg_w4a8, cfg_w4_only])
@pytest.mark.parametrize("strides,padding", [((1, 1), "SAME"), ((2, 2), [(1, 1), (1, 1)])])
def test_conv_packed_matches_sim(cfg_fn, strides, padding):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 8)).astype(np.float32))
    model = QuantConv(features=16, kernel_size=(3, 3), strides=strides, padding=padding,
                      quant=cfg_fn())
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")
    _, upd = model.apply(variables, x, mode="pack", mutable=["packed"])
    vp = {**variables, **upd}
    y_packed = model.apply(vp, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim), rtol=2e-3, atol=2e-3)


def test_conv_packed_asymmetric_weights():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 6)).astype(np.float32))
    cfg = LayerQuantCfg(
        weight={"n_bits": 8, "symmetric": False, "granularity": "channel",
                "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )
    model = QuantConv(features=12, kernel_size=(3, 3), quant=cfg)
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")
    _, upd = model.apply(variables, x, mode="pack", mutable=["packed"])
    y_packed = model.apply({**variables, **upd}, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim), rtol=3e-3, atol=3e-3)


def test_full_model_pack_and_size_reduction():
    W8A8 = {
        "default": {
            "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                       "range": {"name": "minmax"}},
            "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                           "range": {"name": "minmax"}},
            "bn_folding": True,
        }
    }
    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(W8A8))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")

    deploy = pack_model(model, variables, x)
    y_packed = model.apply(deploy, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim), rtol=5e-3, atol=5e-3)

    # deploy weights must be meaningfully smaller than FP32 params
    # (corr_a maps are an inference-time cache keyed by input size, not
    # model payload — exclude them like the activation workspace)
    def strip_corr(tree):
        if not isinstance(tree, dict):
            return tree
        return {k: strip_corr(v) for k, v in tree.items() if k != "corr_a"}

    fp32_size = model_size_bytes({"params": variables["params"]})
    packed_size = model_size_bytes({"packed": strip_corr(deploy["packed"]),
                                    "params": deploy["params"]})
    assert packed_size < 0.5 * fp32_size


def test_w4_model_packs_to_quarter():
    W4 = {
        "default": {
            "weight": {"n_bits": 4, "symmetric": True, "granularity": "channel",
                       "range": {"name": "minmax"}},
            "activation": {"n_bits": 32},
            "bn_folding": True,
        }
    }
    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(W4))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    variables = calibrated(model, x)
    deploy = pack_model(model, variables, x)
    y = model.apply(deploy, x, mode="packed")
    assert np.isfinite(np.asarray(y)).all()
    # int4 weight payload: w_p4/w_p4c buffers hold 2 weights per byte
    from quantize_tpu.deploy import _W_KEYS

    def count(tree, keys):
        tot = 0
        for k, v in tree.items():
            if isinstance(v, dict):
                tot += count(v, keys)
            elif k in keys:
                tot += np.asarray(v).nbytes
        return tot

    w4_bytes = count(deploy["packed"], set(_W_KEYS))
    fp32_bytes = count(variables["params"], {"kernel"})
    assert w4_bytes < 0.15 * fp32_bytes


def test_depthwise_conv_packed_matches_sim():
    """Grouped (depthwise) conv through the packed path (MobileNet blocks)."""
    rng = np.random.default_rng(7)
    ch = 8
    x = jnp.asarray(rng.normal(size=(2, 10, 10, ch)).astype(np.float32))
    model = QuantConv(features=ch, kernel_size=(3, 3), feature_group_count=ch,
                      quant=cfg_w8a8())
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")
    _, upd = model.apply(variables, x, mode="pack", mutable=["packed"])
    y_packed = model.apply({**variables, **upd}, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_mobilenet_v2_full_packed():
    W8A8 = {
        "default": {
            "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                       "range": {"name": "minmax"}},
            "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                           "range": {"name": "minmax"}},
            "bn_folding": True,
        }
    }
    model = MODELS.build("mobilenet_v2", num_classes=4, ctx=QuantCtx(W8A8))
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")
    deploy = pack_model(model, variables, x)
    y_packed = model.apply(deploy, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim), rtol=2e-2, atol=2e-2)


def test_unpack_model_roundtrip():
    """deploy -> unpack -> fp32 forward matches the quant simulation of the
    original (the int weights ARE the simulated weights)."""
    from quantize_tpu.deploy import unpack_model

    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx({
        "default": {
            "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                       "range": {"name": "minmax"}},
            "activation": {"n_bits": 32},
            "bn_folding": True,
        }}))
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")
    deploy = pack_model(model, variables, x)
    restored = unpack_model(deploy)
    y_restored = model.apply(restored, x, mode="fp32")
    np.testing.assert_allclose(np.asarray(y_restored), np.asarray(y_sim),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("groups", [2, 3])
def test_grouped_conv_packed_asymmetric_weights(groups):
    """Grouped conv + asymmetric weights exercises the per-group
    row-sum/repeat zero-point algebra (ops/qconv.py) that groups=1 and
    symmetric-weight tests never reach."""
    rng = np.random.default_rng(10 + groups)
    cin, cout = 6 * groups, 12 * groups
    x = jnp.asarray(rng.normal(size=(2, 10, 10, cin)).astype(np.float32))
    cfg = LayerQuantCfg(
        weight={"n_bits": 8, "symmetric": False, "granularity": "channel",
                "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )
    model = QuantConv(features=cout, kernel_size=(3, 3), feature_group_count=groups,
                      quant=cfg)
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")
    _, upd = model.apply(variables, x, mode="pack", mutable=["packed"])
    y_packed = model.apply({**variables, **upd}, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim),
                               rtol=3e-3, atol=3e-3)


def test_resnet_act_quant_layers_opt_in():
    """nn_relu / nn_maxpool2d / nn_adaptiveavgpool2d config keys flip the
    CNN zoo's ReLU/pool sites to activation-quantized layers (reference's
    commented-out surgery, reconstruct.py:123-129); absent keys leave the
    plain ops and an identical variables tree."""
    act8 = {"activation": {"n_bits": 8, "symmetric": False,
                           "granularity": "layer", "range": {"name": "minmax"}}}
    base = {
        "default": {
            "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                       "range": {"name": "minmax"}},
            "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                           "range": {"name": "minmax"}},
            "bn_folding": True,
        }
    }
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    plain = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(base))
    v_plain = calibrated(plain, x)
    assert "relu" not in str(jax.tree_util.tree_structure(v_plain["qobs"]))

    cfg = {**base, "nn_relu": dict(act8), "nn_maxpool2d": dict(act8),
           "nn_adaptiveavgpool2d": dict(act8)}
    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(cfg))
    v = calibrated(model, x)
    qobs_paths = str(jax.tree_util.tree_structure(v["qobs"]))
    assert "relu1" in qobs_paths and "maxpool" in qobs_paths and "avgpool" in qobs_paths

    y_q = model.apply(v, x, mode="quant")
    deploy = pack_model(model, v, x)
    y_p = model.apply(deploy, x, mode="packed")
    assert y_q.shape == y_p.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_q),
                               rtol=5e-2, atol=5e-2)


def test_s2d_stem_matches_direct_conv():
    """Space-to-depth stem rewrite == direct stride-2 conv (exact math)."""
    import quantize_tpu.nn.layers as layers_mod

    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    model = QuantConv(features=16, kernel_size=(7, 7), strides=(2, 2),
                      padding=[(3, 3), (3, 3)], quant=cfg_w8a8(), s2d=True)
    variables = calibrated(model, x)
    _, upd = model.apply(variables, x, mode="pack", mutable=["packed"])
    vp = {**variables, **upd}
    y_s2d = model.apply(vp, x, mode="packed")

    direct = QuantConv(features=16, kernel_size=(7, 7), strides=(2, 2),
                       padding=[(3, 3), (3, 3)], quant=cfg_w8a8(), s2d=False)
    y_direct = direct.apply(vp, x, mode="packed")
    assert y_s2d.shape == y_direct.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_direct),
                               rtol=1e-5, atol=1e-5)


def test_s2d_resnet50_packed_matches_sim():
    """ResNet stem s2d (default on) keeps packed == quant at model level."""
    W8A8 = {
        "default": {
            "weight": {"n_bits": 8, "symmetric": True, "signed": True,
                       "granularity": "channel", "range": {"name": "minmax"}},
            "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                           "range": {"name": "minmax"}},
            "bn_folding": True,
        }
    }
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W8A8))
    v = calibrated(model, x)
    y_sim = model.apply(v, x, mode="quant")
    deploy = pack_model(model, v, x)
    y_packed = model.apply(deploy, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("group", [0, 4])
@pytest.mark.parametrize("w_bits", [8, 4])
def test_conv_awq_packed_matches_sim(group, w_bits):
    """AWQ packed deploy for CONV layers (the round-2 NotImplementedError,
    nn/layers.py): the packed kernel stores Q(w·awq) and the weight-only
    path folds 1/awq (and q_group_size grids) into the dequantized kernel,
    exactly like the dense path (reference awq.py:119-121 scope extended)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    rng_cfg = {"name": "awq", "grid": 8}
    if group:
        rng_cfg["q_group_size"] = group
    cfg = LayerQuantCfg(
        weight={"n_bits": w_bits, "symmetric": True, "signed": True,
                "granularity": "channel", "range": rng_cfg},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )
    model = QuantConv(features=16, kernel_size=(3, 3), quant=cfg)
    variables = calibrated(model, x)
    y_sim = model.apply(variables, x, mode="quant")
    _, upd = model.apply(variables, x, mode="pack", mutable=["packed"])
    y_packed = model.apply({**variables, **upd}, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim),
                               rtol=3e-3, atol=3e-3)

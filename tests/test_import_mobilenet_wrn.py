"""MobileNet/WideResNet torch-checkpoint importers: folded == unfolded.

Non-vacuous by construction: the synthetic state dicts carry random BN
stats, so the folded and unfolded forwards only agree if the weights were
actually placed (the strict importer additionally raises on any path that
does not resolve into the initialized variables tree)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.models import MODELS
from quantize_tpu.models.import_mobilenet import (import_mobilenet_v1,
                                                  import_mobilenet_v2,
                                                  import_mobilenet_v3)
from quantize_tpu.models.import_wideresnet import import_wideresnet
from quantize_tpu.models.mobilenet import (_V3_SMALL, MobileNetV1,
                                           MobileNetV2, _make_divisible)

W32F = {"default": {"weight": {"n_bits": 32}, "activation": {"n_bits": 32},
                    "bn_folding": True}}
W32U = {"default": {"weight": {"n_bits": 32}, "activation": {"n_bits": 32},
                    "bn_folding": False}}


def _conv(sd, rng, key, cout, cin, k):
    sd[f"{key}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.1


def _bn(sd, rng, key, c):
    sd[f"{key}.weight"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)
    sd[f"{key}.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.1
    sd[f"{key}.running_mean"] = rng.normal(size=(c,)).astype(np.float32) * 0.1
    sd[f"{key}.running_var"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)


def _linear(sd, rng, key, cout, cin, bias=True):
    sd[f"{key}.weight"] = rng.normal(size=(cout, cin)).astype(np.float32) * 0.1
    if bias:
        sd[f"{key}.bias"] = rng.normal(size=(cout,)).astype(np.float32) * 0.1


def synth_mobilenet_v2_sd(rng, num_classes=10):
    sd = {}
    _conv(sd, rng, "features.0.0", 32, 3, 3)
    _bn(sd, rng, "features.0.1", 32)
    in_ch, i = 32, 1
    for t, c, n, _s in MobileNetV2.CFG:
        out_ch = _make_divisible(c)
        for _ in range(n):
            hidden = int(round(in_ch * t))
            tk = f"features.{i}.conv"
            if t != 1:
                _conv(sd, rng, f"{tk}.0.0", hidden, in_ch, 1)
                _bn(sd, rng, f"{tk}.0.1", hidden)
                sd[f"{tk}.1.0.weight"] = rng.normal(
                    size=(hidden, 1, 3, 3)).astype(np.float32) * 0.1
                _bn(sd, rng, f"{tk}.1.1", hidden)
                _conv(sd, rng, f"{tk}.2", out_ch, hidden, 1)
                _bn(sd, rng, f"{tk}.3", out_ch)
            else:
                sd[f"{tk}.0.0.weight"] = rng.normal(
                    size=(hidden, 1, 3, 3)).astype(np.float32) * 0.1
                _bn(sd, rng, f"{tk}.0.1", hidden)
                _conv(sd, rng, f"{tk}.1", out_ch, hidden, 1)
                _bn(sd, rng, f"{tk}.2", out_ch)
            in_ch = out_ch
            i += 1
    _conv(sd, rng, f"features.{i}.0", 1280, in_ch, 1)
    _bn(sd, rng, f"features.{i}.1", 1280)
    _linear(sd, rng, "classifier.1", num_classes, 1280)
    return sd


def synth_mobilenet_v3_small_sd(rng, num_classes=10):
    sd = {}
    _conv(sd, rng, "features.0.0", 16, 3, 3)
    _bn(sd, rng, "features.0.1", 16)
    in_ch = 16
    for i, (k, exp, out_ch, use_se, _hs, _s) in enumerate(_V3_SMALL):
        tk = f"features.{i + 1}.block"
        j = 0
        if exp != in_ch:
            _conv(sd, rng, f"{tk}.{j}.0", exp, in_ch, 1)
            _bn(sd, rng, f"{tk}.{j}.1", exp)
            j += 1
        sd[f"{tk}.{j}.0.weight"] = rng.normal(
            size=(exp, 1, k, k)).astype(np.float32) * 0.1
        _bn(sd, rng, f"{tk}.{j}.1", exp)
        j += 1
        if use_se:
            sq = _make_divisible(exp // 4)
            _conv(sd, rng, f"{tk}.{j}.fc1", sq, exp, 1)
            sd[f"{tk}.{j}.fc1.bias"] = rng.normal(size=(sq,)).astype(np.float32) * 0.1
            _conv(sd, rng, f"{tk}.{j}.fc2", exp, sq, 1)
            sd[f"{tk}.{j}.fc2.bias"] = rng.normal(size=(exp,)).astype(np.float32) * 0.1
            j += 1
        _conv(sd, rng, f"{tk}.{j}.0", out_ch, exp, 1)
        _bn(sd, rng, f"{tk}.{j}.1", out_ch)
        in_ch = out_ch
    head = len(_V3_SMALL) + 1
    _conv(sd, rng, f"features.{head}.0", 576, in_ch, 1)
    _bn(sd, rng, f"features.{head}.1", 576)
    _linear(sd, rng, "classifier.0", 1024, 576)
    _linear(sd, rng, "classifier.3", num_classes, 1024)
    return sd


def synth_mobilenet_v1_sd(rng, num_classes=10):
    sd = {}
    _conv(sd, rng, "conv1", 32, 3, 3)
    _bn(sd, rng, "bn1", 32)
    in_ch = 32
    outs = iter(MobileNetV1.CFG)
    for s, n_blocks in enumerate((1, 2, 2, 6, 2), start=1):
        for b in range(n_blocks):
            out_ch, _stride = next(outs)
            tp = f"layer{s}.{b}"
            sd[f"{tp}.conv1.weight"] = rng.normal(
                size=(in_ch, 1, 3, 3)).astype(np.float32) * 0.1
            _bn(sd, rng, f"{tp}.bn1", in_ch)
            _conv(sd, rng, f"{tp}.conv2", out_ch, in_ch, 1)
            _bn(sd, rng, f"{tp}.bn2", out_ch)
            in_ch = out_ch
    _linear(sd, rng, "fc", num_classes, 1024)
    return sd


def synth_wrn_sd(rng, depth=10, widen=2, num_classes=10):
    n = (depth - 4) // 6
    widths = [16, 16 * widen, 32 * widen, 64 * widen]
    sd = {}
    _conv(sd, rng, "conv1", widths[0], 3, 3)
    in_p = widths[0]
    for stage in range(1, 4):
        out_p = widths[stage]
        for b in range(n):
            tp = f"block{stage}.layer.{b}"
            _bn(sd, rng, f"{tp}.bn1", in_p)
            _conv(sd, rng, f"{tp}.conv1", out_p, in_p, 3)
            _bn(sd, rng, f"{tp}.bn2", out_p)
            _conv(sd, rng, f"{tp}.conv2", out_p, out_p, 3)
            if in_p != out_p:
                _conv(sd, rng, f"{tp}.convShortcut", out_p, in_p, 1)
            in_p = out_p
    _bn(sd, rng, "bn1", widths[3])
    _linear(sd, rng, "fc", num_classes, widths[3])
    return sd


def _check_folded_equals_unfolded(model_name, sd, importer, x, **kw):
    folded = MODELS.build(model_name, num_classes=10, ctx=_ctx(W32F))
    fv = dict(folded.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    fv.pop("taps", None)
    fv = importer(sd, fv, fold_bn=True, **kw)
    y_f = folded.apply(fv, x, mode="fp32")

    unfolded = MODELS.build(model_name, num_classes=10, ctx=_ctx(W32U))
    uv = dict(unfolded.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    uv.pop("taps", None)
    uv = importer(sd, uv, fold_bn=False, **kw)
    y_u = unfolded.apply(uv, x, mode="fp32")

    # with random BN stats, agreement requires the weights actually landed
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=2e-3, atol=2e-3)
    assert float(jnp.std(y_f)) > 1e-5


def _ctx(cfg):
    from quantize_tpu.nn.intercept import QuantCtx

    return QuantCtx(cfg)


@pytest.mark.slow
def test_import_mobilenet_v2(rng):
    sd = synth_mobilenet_v2_sd(rng)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    _check_folded_equals_unfolded("mobilenet_v2", sd, import_mobilenet_v2, x)


@pytest.mark.slow
def test_import_mobilenet_v3_small(rng):
    sd = synth_mobilenet_v3_small_sd(rng)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    _check_folded_equals_unfolded("mobilenet_v3_small", sd,
                                  import_mobilenet_v3, x, small=True)


@pytest.mark.slow
def test_import_mobilenet_v1(rng):
    sd = synth_mobilenet_v1_sd(rng)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    _check_folded_equals_unfolded("mobilenet_v1", sd, import_mobilenet_v1, x)


def test_import_wideresnet():
    rng = np.random.default_rng(3)
    sd = synth_wrn_sd(rng, depth=10, widen=2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    from quantize_tpu.models.wideresnet import WideResNet

    folded = WideResNet(depth=10, widen_factor=2, num_classes=10, ctx=_ctx(W32F))
    fv = dict(folded.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    fv.pop("taps", None)
    fv = import_wideresnet(sd, fv, depth=10, fold_bn=True)
    y_f = folded.apply(fv, x, mode="fp32")

    unfolded = WideResNet(depth=10, widen_factor=2, num_classes=10, ctx=_ctx(W32U))
    uv = dict(unfolded.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    uv.pop("taps", None)
    uv = import_wideresnet(sd, uv, depth=10, fold_bn=False)
    y_u = unfolded.apply(uv, x, mode="fp32")

    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=2e-3, atol=2e-3)
    assert float(jnp.std(y_f)) > 1e-5


def test_importer_rejects_orphan_paths(rng):
    """The strict importer must raise when a destination path is missing
    (the silent-orphan failure mode that motivated it)."""
    from quantize_tpu.models.import_torch import set_leaf

    tree = {"a": {"kernel": np.zeros((2, 2))}}
    with pytest.raises(KeyError):
        set_leaf(tree, "b/kernel", np.zeros((2, 2)))
    with pytest.raises(KeyError):
        set_leaf(tree, "a/missing", np.zeros((2, 2)))
    with pytest.raises(ValueError):
        set_leaf(tree, "a/kernel", np.zeros((3, 3)))

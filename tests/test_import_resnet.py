"""Torch-style checkpoint import: folded model == unfolded model (eval)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.models import MODELS
from quantize_tpu.models.import_resnet import import_resnet
from quantize_tpu.models.import_torch import fold_bn
from quantize_tpu.nn.intercept import QuantCtx


def synth_resnet18_state_dict(rng, num_classes=10):
    """A random torchvision-resnet18-shaped state dict (no torchvision needed)."""
    sd = {}

    def conv(key, cout, cin, k):
        sd[f"{key}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.1

    def bn(key, c):
        sd[f"{key}.weight"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.1
        sd[f"{key}.running_mean"] = rng.normal(size=(c,)).astype(np.float32) * 0.1
        sd[f"{key}.running_var"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for s in range(1, 5):
        cin, cout = chans[s - 1], chans[s]
        for b in range(2):
            cin_b = cin if b == 0 else cout
            conv(f"layer{s}.{b}.conv1", cout, cin_b, 3)
            bn(f"layer{s}.{b}.bn1", cout)
            conv(f"layer{s}.{b}.conv2", cout, cout, 3)
            bn(f"layer{s}.{b}.bn2", cout)
            if b == 0 and (s > 1):
                conv(f"layer{s}.{b}.downsample.0", cout, cin, 1)
                bn(f"layer{s}.{b}.downsample.1", cout)
    sd["fc.weight"] = rng.normal(size=(num_classes, 512)).astype(np.float32) * 0.1
    sd["fc.bias"] = rng.normal(size=(num_classes,)).astype(np.float32) * 0.1
    return sd


def test_fold_bn_math():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    beta = rng.normal(size=4).astype(np.float32)
    mean = rng.normal(size=4).astype(np.float32)
    var = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    wf, bf, ss = fold_bn(w, None, gamma, beta, mean, var, eps=1e-5)
    assert ss is None
    mult = gamma / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(wf, w * mult.reshape(-1, 1, 1, 1), rtol=1e-6)
    np.testing.assert_allclose(bf, beta - mean * mult, rtol=1e-5)


@pytest.mark.parametrize("into_scale", [pytest.param(False, marks=pytest.mark.slow), True])
def test_folded_equals_unfolded_forward(into_scale):
    rng = np.random.default_rng(1)
    sd = synth_resnet18_state_dict(rng)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    W32 = {"default": {"weight": {"n_bits": 32}, "activation": {"n_bits": 32},
                       "bn_folding": True}}
    folded_model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W32))
    fv = dict(folded_model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    fv.pop("taps", None)
    fv = import_resnet(sd, fv, fold_bn=True, into_scale=into_scale)
    y_folded = folded_model.apply(fv, x, mode="quant" if into_scale else "fp32")
    # NOTE: into_scale puts the BN multiplier in the quantizer static_scale,
    # which applies in every mode (reference quantizer.py:265-277)

    W32u = {"default": {"weight": {"n_bits": 32}, "activation": {"n_bits": 32},
                        "bn_folding": False}}
    unfolded_model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W32u))
    uv = dict(unfolded_model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    uv.pop("taps", None)
    uv = import_resnet(sd, uv, fold_bn=False)
    y_unfolded = unfolded_model.apply(uv, x, mode="fp32")

    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_unfolded),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_quantized_after_import_close_to_fp32():
    rng = np.random.default_rng(2)
    sd = synth_resnet18_state_dict(rng)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    W8A8 = {"default": {
        "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True}}
    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W8A8))
    v = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    v.pop("taps", None)
    v = import_resnet(sd, v, fold_bn=True)
    _, upd = model.apply(v, x, mode="calibrate", mutable=["qobs", "qparams"])
    v = {**v, **upd}
    y_fp = model.apply(v, x, mode="fp32")
    y_q = model.apply(v, x, mode="quant")
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    assert rel < 0.05


def test_import_places_folded_kernels():
    """Direct placement check: the tree kernel equals fold_bn of the torch
    tensors (guards against orphaned writes that leave the random init)."""
    rng = np.random.default_rng(4)
    sd = synth_resnet18_state_dict(rng)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    W32 = {"default": {"weight": {"n_bits": 32}, "activation": {"n_bits": 32},
                       "bn_folding": True}}
    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W32))
    v = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    v.pop("taps", None)
    v = import_resnet(sd, v, fold_bn=True)

    w_f, b_f, _ = fold_bn(
        sd["layer2.0.conv1.weight"], None,
        sd["layer2.0.bn1.weight"], sd["layer2.0.bn1.bias"],
        sd["layer2.0.bn1.running_mean"], sd["layer2.0.bn1.running_var"])
    got = np.asarray(v["params"]["layer2_0"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, w_f.transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v["params"]["layer2_0"]["conv1"]["bias"]), b_f, rtol=1e-5)


def test_torch_checkpoint_auto_import(tmp_path):
    """cfg.model.torch_checkpoint path: .pth file -> auto importer dispatch."""
    torch = pytest.importorskip("torch")
    from quantize_tpu.models.import_auto import (import_torch_checkpoint,
                                                 load_torch_state_dict)

    rng = np.random.default_rng(5)
    sd_np = synth_resnet18_state_dict(rng)
    path = tmp_path / "resnet18.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd_np.items()}, path)

    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    W32 = {"default": {"weight": {"n_bits": 32}, "activation": {"n_bits": 32},
                       "bn_folding": True}}
    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W32))
    v = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    v.pop("taps", None)
    sd = load_torch_state_dict(str(path))
    v2 = import_torch_checkpoint("resnet18", sd, v)
    ref = import_resnet(sd_np, v, fold_bn=True)
    np.testing.assert_allclose(
        np.asarray(v2["params"]["fc"]["kernel"]),
        np.asarray(ref["params"]["fc"]["kernel"]))


def test_checkpoint_sha256_manifest(tmp_path):
    """Reference parity for weight integrity (clip.py:30-72): a pinned
    digest hard-fails on mismatch; 'auto' consults the published-CLIP
    manifest and is a no-op for models without a vendored digest."""
    import pytest

    from quantize_tpu.models.manifest import (CLIP_SHA256, sha256_of,
                                              verify_checkpoint)

    p = tmp_path / "ckpt.pth"
    p.write_bytes(b"not really a checkpoint")
    digest = sha256_of(str(p))
    verify_checkpoint(str(p), digest)  # exact pin, matches
    verify_checkpoint(str(p), "auto", model_name="resnet18")  # no entry -> ok
    with pytest.raises(ValueError, match="sha256 mismatch"):
        verify_checkpoint(str(p), "0" * 64)
    with pytest.raises(ValueError, match="sha256 mismatch"):
        verify_checkpoint(str(p), "auto", model_name="clip_vit-b16")
    assert len(CLIP_SHA256) == 9
    assert all(len(v) == 64 for v in CLIP_SHA256.values())

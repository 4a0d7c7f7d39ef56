"""PARITY tier: real-data accuracy deltas (BASELINE config[0]).

These tests turn green the moment real data/weights are supplied (this
environment has zero egress, so neither ships in the repo):

* ``QTPU_CIFAR10_ROOT``  — directory containing ``cifar-10-batches-py/``
  (the standard python-pickle batches).
* ``QTPU_RN18_CIFAR_PTH`` — a torch state dict for a CIFAR-trained
  torchvision-layout ResNet-18 (``fc`` sized to 10 classes).

With both set, the test runs FP32 eval, 16-image min-max PTQ calibration,
quantized eval, and asserts Δ top-1 < 1% — the reference's W8A8 accuracy
criterion (``configs/README.md:16-89``, BASELINE.json config[0]).
With only the data set, a weaker invariant still runs on the real images:
calibrated W8A8 quantized logits must agree with FP32 logits in argmax on
>=97% of a batch for the randomly-initialized network.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx

CIFAR_ROOT = os.environ.get("QTPU_CIFAR10_ROOT")
RN18_PTH = os.environ.get("QTPU_RN18_CIFAR_PTH")

W8A8 = {"default": {
    "weight": {"n_bits": 8, "symmetric": True, "signed": True,
               "granularity": "channel", "range": {"name": "minmax"}},
    "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                   "range": {"name": "minmax"}},
    "bn_folding": True}}


def _load_cifar_val(n: int):
    from quantize_tpu.utils.config import Config

    from quantize_tpu.data.cifar import cifar10

    ds = cifar10(Config({"root": CIFAR_ROOT, "split": "test"}))
    imgs, labels = [], []
    for i in range(n):
        d = ds[i]
        img = np.asarray(d.image, np.float32)
        if img.max() > 2.0:
            img = img / 255.0
        imgs.append(img)
        labels.append(int(d.label))
    x = np.stack(imgs)
    if x.shape[1] == 3:  # CHW -> HWC
        x = x.transpose(0, 2, 3, 1)
    return jnp.asarray(x), np.asarray(labels)


def _calibrate(model, variables, x_cal):
    _, upd = model.apply(variables, x_cal, mode="calibrate",
                         mutable=["qobs", "qparams"])
    return {**variables, **upd}


@pytest.mark.skipif(CIFAR_ROOT is None, reason="QTPU_CIFAR10_ROOT not set")
def test_cifar10_w8a8_argmax_agreement():
    x, _ = _load_cifar_val(256)
    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W8A8))
    v = dict(model.init(jax.random.PRNGKey(0), x[:2], mode="calibrate"))
    v.pop("taps", None)
    v = _calibrate(model, v, x[:16])
    y_fp = model.apply(v, x, mode="fp32")
    y_q = model.apply(v, x, mode="quant")
    agree = float(np.mean(np.argmax(np.asarray(y_fp), -1)
                          == np.argmax(np.asarray(y_q), -1)))
    assert agree >= 0.97, f"W8A8 argmax agreement {agree:.3f} < 0.97"


@pytest.mark.skipif(CIFAR_ROOT is None or RN18_PTH is None,
                    reason="QTPU_CIFAR10_ROOT / QTPU_RN18_CIFAR_PTH not set")
def test_cifar10_resnet18_w8a8_delta_top1():
    """BASELINE config[0]: ResNet-18 W8A8 PTQ min-max on CIFAR-10,
    Δ top-1 < 1% vs the FP32 import."""
    from quantize_tpu.models.import_auto import (import_torch_checkpoint,
                                                 load_torch_state_dict)

    x, labels = _load_cifar_val(2000)
    model = MODELS.build("resnet18", num_classes=10, ctx=QuantCtx(W8A8))
    v = dict(model.init(jax.random.PRNGKey(0), x[:2], mode="calibrate"))
    v.pop("taps", None)
    v = import_torch_checkpoint("resnet18", load_torch_state_dict(RN18_PTH), v)
    v = _calibrate(model, v, x[:16])

    def top1(mode):
        correct = 0
        for i in range(0, len(labels), 250):
            logits = model.apply(v, x[i:i + 250], mode=mode)
            correct += int(np.sum(np.argmax(np.asarray(logits), -1)
                                  == labels[i:i + 250]))
        return correct / len(labels)

    acc_fp, acc_q = top1("fp32"), top1("quant")
    assert acc_fp > 0.5, f"FP32 import sanity failed: top1={acc_fp:.3f}"
    assert acc_fp - acc_q < 0.01, (
        f"Δ top-1 {100 * (acc_fp - acc_q):.2f}% >= 1% (fp32 {acc_fp:.4f}, "
        f"w8a8 {acc_q:.4f})")

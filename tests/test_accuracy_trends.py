"""Accuracy-delta trends vs the reference's tables (synthetic proxy).

The reference validates by ImageNet top-1 deltas (BASELINE.md). Without
ImageNet access, this harness trains a small FP32 CNN to high accuracy on
the synthetic task, then checks the *qualitative* ordering the reference
tables establish:

* W8A8 loses almost nothing vs FP32 (Δ < a few points),
* at low weight bits, per-channel scales beat per-layer scales
  (``configs/README.md:18-21``: minmax_channel >> minmax_layer at W4),
* MSE search does no worse than plain minmax at low bits.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from quantize_tpu.data import make_synthetic
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx


def quant_cfg(w_bits=8, a_bits=8, w_gran="channel", w_range="minmax"):
    return {
        "default": {
            "weight": {"n_bits": w_bits, "symmetric": True, "signed": True,
                       "granularity": w_gran, "range": {"name": w_range}},
            "activation": {"n_bits": a_bits, "symmetric": False, "granularity": "layer",
                           "range": {"name": "minmax"}},
            "bn_folding": True,
        }
    }


@pytest.fixture(scope="module")
def trained_fp32():
    """Train the testcnn FP32 on the synthetic task to high accuracy."""
    train = make_synthetic(n=512, image_size=16, num_classes=10, seed=1, noise=0.4)
    test = make_synthetic(n=256, image_size=16, num_classes=10, seed=2, noise=0.4)
    model = MODELS.build("testcnn", num_classes=10, ctx=QuantCtx(quant_cfg()))
    x0 = jnp.asarray(train.images[:64])
    variables = dict(model.init(jax.random.PRNGKey(0), x0, mode="calibrate"))
    variables.pop("taps", None)

    tx = optax.adam(3e-3)
    params = variables["params"]
    opt_state = tx.init(params)
    frozen = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({**frozen, "params": p}, x, mode="fp32")
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for _ in range(150):
        idx = rng.integers(0, len(train.images), 64)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(train.images[idx]), jnp.asarray(train.labels[idx]))
    variables = {**frozen, "params": params}
    return model, variables, train, test


def _accuracy(model, variables, ds, mode):
    logits = model.apply(variables, jnp.asarray(ds.images), mode=mode)
    pred = np.argmax(np.asarray(logits), axis=1)
    return 100.0 * (pred == ds.labels).mean()


def _calibrate_with_cfg(trained, cfg):
    model_fp, variables, train, test = trained
    model = MODELS.build("testcnn", num_classes=10, ctx=QuantCtx(cfg))
    v = dict(variables)
    # recalibrate observers for this quant config from scratch
    v.pop("qobs", None)
    v.pop("qparams", None)
    for i in range(0, 256, 64):
        x = jnp.asarray(train.images[i:i + 64])
        _, upd = model.apply(v, x, mode="calibrate", mutable=["qobs", "qparams"])
        v = {**v, **upd}
    return model, v


def test_w8a8_delta_small(trained_fp32):
    model_fp, variables, train, test = trained_fp32
    acc_fp = _accuracy(model_fp, variables, test, "fp32")
    assert acc_fp > 80.0, f"FP32 baseline too weak ({acc_fp})"

    model_q, vq = _calibrate_with_cfg(trained_fp32, quant_cfg(8, 8))
    acc_q = _accuracy(model_q, vq, test, "quant")
    assert acc_fp - acc_q < 5.0, f"W8A8 delta too large: {acc_fp} -> {acc_q}"


def test_low_bit_channel_beats_layer(trained_fp32):
    model_fp, variables, train, test = trained_fp32
    m_ch, v_ch = _calibrate_with_cfg(trained_fp32, quant_cfg(3, 32, w_gran="channel"))
    m_ly, v_ly = _calibrate_with_cfg(trained_fp32, quant_cfg(3, 32, w_gran="layer"))
    acc_ch = _accuracy(m_ch, v_ch, test, "quant")
    acc_ly = _accuracy(m_ly, v_ly, test, "quant")
    # reference tables: per-channel >> per-layer at low weight bits
    assert acc_ch >= acc_ly - 1.0, f"channel {acc_ch} vs layer {acc_ly}"


def test_mse_no_worse_than_minmax(trained_fp32):
    m_mm, v_mm = _calibrate_with_cfg(trained_fp32, quant_cfg(3, 32, w_range="minmax"))
    m_gs, v_gs = _calibrate_with_cfg(trained_fp32, quant_cfg(3, 32, w_range="mse"))
    model_fp, variables, train, test = trained_fp32
    acc_mm = _accuracy(m_mm, v_mm, test, "quant")
    acc_gs = _accuracy(m_gs, v_gs, test, "quant")
    assert acc_gs >= acc_mm - 2.0, f"mse {acc_gs} vs minmax {acc_mm}"


def test_adaround_beats_nearest_rounding(trained_fp32):
    """AdaRound reconstruction should recover accuracy lost to nearest
    rounding at low weight bits (the reference's headline result,
    configs/README.md:28-37)."""
    import optax as _optax

    from quantize_tpu.quant.adaround import beta_schedule, regularization

    model_fp, variables, train, test = trained_fp32
    W3 = quant_cfg(3, 32, w_gran="channel")
    W3["default"]["weight"]["adaround"] = {"apply": True}
    model = MODELS.build("testcnn", num_classes=10, ctx=QuantCtx(W3))

    v = dict(variables)
    v.pop("qobs", None)
    v.pop("qparams", None)
    x0 = jnp.asarray(train.images[:64])
    _, upd = model.apply(v, x0, mode="calibrate", mutable=["qobs", "qparams"])
    v = {**v, **upd}
    acc_nearest = _accuracy(model, v, test, "quant")

    # init V and optimize it (compact version of the AdaRound runner loop)
    _, upd = model.apply(v, x0, mode="init_adaround", mutable=["adaround"])
    v = {**v, **upd}
    tx = _optax.adam(1e-2)
    opt_state = tx.init(v["adaround"])

    @jax.jit
    def ada_step(v_all, opt_state, x, beta):
        _, upd = model.apply(v_all, x, mode="calibrate",
                             mutable=["qobs", "qparams", "taps"])
        fp_taps = jax.lax.stop_gradient(upd.pop("taps"))
        v_all = {**v_all, "qobs": upd["qobs"], "qparams": upd["qparams"]}

        def loss_fn(ada):
            _, upd2 = model.apply({**v_all, "adaround": ada}, x, mode="quant",
                                  mutable=["taps"])
            recon = sum(jax.tree.leaves(jax.tree.map(
                lambda q, o: jnp.mean((q - o) ** 2), upd2["taps"], fp_taps)))
            reg = sum(regularization(t, beta) for t in jax.tree.leaves(ada))
            return recon + 0.01 * reg

        loss, grads = jax.value_and_grad(loss_fn)(v_all["adaround"])
        updates, opt_state = tx.update(grads, opt_state, v_all["adaround"])
        ada = _optax.apply_updates(v_all["adaround"], updates)
        return {**v_all, "adaround": ada}, opt_state, loss

    rng = np.random.default_rng(3)
    total = 80
    for it in range(total):
        idx = rng.integers(0, len(train.images), 64)
        beta = jnp.asarray(float(beta_schedule(it, total)), jnp.float32)
        v, opt_state, loss = ada_step(v, opt_state, jnp.asarray(train.images[idx]), beta)

    acc_ada = _accuracy(model, v, test, "quant")
    assert acc_ada >= acc_nearest - 1.0, f"adaround {acc_ada} vs nearest {acc_nearest}"


def test_w2_cliff_layer_collapses_channel_survives(trained_fp32):
    """The reference's most dramatic table behavior (BASELINE.md W2 rows):
    at W2, per-layer minmax COLLAPSES toward chance while per-channel
    survives with a large margin. Proxy measurements (deterministic seeds):
    layer 11.3%, channel 40.2%, fp32 100%."""
    model_fp, variables, train, test = trained_fp32
    m_ch, v_ch = _calibrate_with_cfg(trained_fp32, quant_cfg(2, 32, w_gran="channel"))
    m_ly, v_ly = _calibrate_with_cfg(trained_fp32, quant_cfg(2, 32, w_gran="layer"))
    acc_ch = _accuracy(m_ch, v_ch, test, "quant")
    acc_ly = _accuracy(m_ly, v_ly, test, "quant")
    acc_fp = _accuracy(model_fp, variables, test, "fp32")
    assert acc_ly <= 25.0, f"W2 per-layer should collapse, got {acc_ly}"
    assert acc_fp - acc_ly >= 50.0, f"no W2 cliff: fp32 {acc_fp} vs layer {acc_ly}"
    assert acc_ch >= acc_ly + 15.0, f"channel {acc_ch} vs layer {acc_ly}"


def test_w2_mse_beats_minmax_strongly(trained_fp32):
    """At W2 the MSE grid search's advantage over plain minmax is large
    (proxy: 73.0 vs 40.2), unlike the near-tie at W8 — the low-bit regime
    is where the reference's estimators actually differentiate."""
    m_mm, v_mm = _calibrate_with_cfg(trained_fp32, quant_cfg(2, 32, w_range="minmax"))
    m_gs, v_gs = _calibrate_with_cfg(trained_fp32, quant_cfg(2, 32, w_range="mse"))
    model_fp, variables, train, test = trained_fp32
    acc_mm = _accuracy(m_mm, v_mm, test, "quant")
    acc_gs = _accuracy(m_gs, v_gs, test, "quant")
    assert acc_gs >= acc_mm + 15.0, f"W2 mse {acc_gs} vs minmax {acc_mm}"


def test_w2_adaround_recovers_cliff(trained_fp32):
    """BASELINE.md: AdaRound holds 47.6% at W2 where nearest-rounding PTQ
    collapses to 0.1 — the reference's headline low-bit result. Proxy:
    adaround 88.7 vs nearest 40.2 at W2-channel (deterministic seeds)."""
    import optax as _optax

    from quantize_tpu.quant.adaround import beta_schedule, regularization

    model_fp, variables, train, test = trained_fp32
    W2 = quant_cfg(2, 32, w_gran="channel")
    W2["default"]["weight"]["adaround"] = {"apply": True}
    model = MODELS.build("testcnn", num_classes=10, ctx=QuantCtx(W2))

    v = dict(variables)
    v.pop("qobs", None)
    v.pop("qparams", None)
    x0 = jnp.asarray(train.images[:64])
    _, upd = model.apply(v, x0, mode="calibrate", mutable=["qobs", "qparams"])
    v = {**v, **upd}
    acc_nearest = _accuracy(model, v, test, "quant")

    _, upd = model.apply(v, x0, mode="init_adaround", mutable=["adaround"])
    v = {**v, **upd}
    tx = _optax.adam(1e-2)
    opt_state = tx.init(v["adaround"])

    @jax.jit
    def ada_step(v_all, opt_state, x, beta):
        _, upd = model.apply(v_all, x, mode="calibrate",
                             mutable=["qobs", "qparams", "taps"])
        fp_taps = jax.lax.stop_gradient(upd.pop("taps"))
        v_all = {**v_all, "qobs": upd["qobs"], "qparams": upd["qparams"]}

        def loss_fn(ada):
            _, upd2 = model.apply({**v_all, "adaround": ada}, x, mode="quant",
                                  mutable=["taps"])
            recon = sum(jax.tree.leaves(jax.tree.map(
                lambda q, o: jnp.mean((q - o) ** 2), upd2["taps"], fp_taps)))
            reg = sum(regularization(t, beta) for t in jax.tree.leaves(ada))
            return recon + 0.01 * reg

        loss, grads = jax.value_and_grad(loss_fn)(v_all["adaround"])
        updates, opt_state = tx.update(grads, opt_state, v_all["adaround"])
        return {**v_all, "adaround": _optax.apply_updates(v_all["adaround"], updates)}, opt_state, loss

    rng = np.random.default_rng(3)
    total = 120
    for it in range(total):
        idx = rng.integers(0, len(train.images), 64)
        beta = jnp.asarray(float(beta_schedule(it, total)), jnp.float32)
        v, opt_state, _ = ada_step(v, opt_state, jnp.asarray(train.images[idx]), beta)

    acc_ada = _accuracy(model, v, test, "quant")
    assert acc_ada >= acc_nearest + 25.0, (
        f"W2 adaround {acc_ada} should recover far above nearest {acc_nearest}")

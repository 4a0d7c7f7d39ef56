"""ViT + QuantMultiheadAttention: calibrate/quant/pack equivalences."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.deploy import pack_model
from quantize_tpu.models import MODELS
from quantize_tpu.models.vit import VisionTransformer
from quantize_tpu.nn.attention import QuantMultiheadAttention
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.nn.layers import LayerQuantCfg

W8A8 = {
    "default": {
        "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True,
    }
}


def mha_cfg():
    return LayerQuantCfg(
        weight={"n_bits": 8, "symmetric": True, "granularity": "channel",
                "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )


def calibrated(model, x, **kw):
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate", **kw))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"], **kw)
    return {**variables, **upd}


def test_mha_quant_close_to_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    m = QuantMultiheadAttention(32, 4, quant=mha_cfg())
    v = calibrated(m, x)
    y_fp = m.apply(v, x, mode="fp32")
    y_q = m.apply(v, x, mode="quant")
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    assert y_q.shape == (2, 10, 32) and rel < 0.1


def test_mha_out_proj_forced_mse():
    """The out-projection weight estimator is forced to MSE (reference
    quantmultiheadattention.py:112-113)."""
    from quantize_tpu.nn.attention import _proj_cfg

    cfg = _proj_cfg(mha_cfg(), force_mse=True, disable_act=True)
    assert dict(dict(cfg.weight)["range"])["name"] == "mse"
    assert dict(cfg.activation)["n_bits"] == 32


def test_mha_causal_mask():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 16)).astype(np.float32))
    m = QuantMultiheadAttention(16, 2, quant=mha_cfg())
    v = calibrated(m, x)
    mask = jnp.triu(jnp.full((6, 6), -jnp.inf), k=1)
    y = m.apply(v, x, mode="quant", mask=mask)
    assert np.isfinite(np.asarray(y)).all()


def test_tiny_vit_pipeline():
    model = VisionTransformer(
        image_size=32, patch_size=8, num_layers=2, num_heads=2,
        hidden_dim=32, mlp_dim=64, num_classes=5, ctx=QuantCtx(W8A8),
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = calibrated(model, x)
    y_fp = model.apply(v, x, mode="fp32")
    y_q = model.apply(v, x, mode="quant")
    assert y_q.shape == (2, 5)
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    assert rel < 0.5  # random weights; sanity only


def test_tiny_vit_packed_matches_sim():
    model = VisionTransformer(
        image_size=32, patch_size=8, num_layers=1, num_heads=2,
        hidden_dim=32, mlp_dim=64, num_classes=5, ctx=QuantCtx(W8A8),
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = calibrated(model, x)
    y_sim = model.apply(v, x, mode="quant")
    deploy = pack_model(model, v, x)
    y_packed = model.apply(deploy, x, mode="packed")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim), rtol=2e-2, atol=2e-2)


@pytest.mark.slow  # full-size build smoke; tiny-ViT tests cover the logic
def test_vit_b16_builds():
    model = MODELS.build("vit_b_16", num_classes=10)
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (1, 10)


@pytest.mark.slow
def test_vit_qat_gradient_step():
    """STE gradients flow through quantized attention + MLP projections."""
    import optax

    model = VisionTransformer(
        image_size=16, patch_size=8, num_layers=1, num_heads=2,
        hidden_dim=16, mlp_dim=32, num_classes=3, ctx=QuantCtx(W8A8),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray([0, 1, 2, 0])
    v = calibrated(model, x)

    def loss_fn(params):
        logits = model.apply({**v, "params": params}, x, mode="quant")
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    l0 = float(loss_fn(v["params"]))
    g = jax.grad(loss_fn)(v["params"])
    gn = float(optax.global_norm(g))
    assert np.isfinite(l0) and gn > 0
    # attention projection weights receive gradient
    attn_g = g["encoder_layer_0"]["self_attention"]["q_proj"]["kernel"]
    assert float(jnp.linalg.norm(attn_g)) > 0


def _mha_cfg_bits(w_bits):
    return LayerQuantCfg(
        weight={"n_bits": w_bits, "symmetric": True, "granularity": "channel",
                "range": {"name": "minmax"}},
        activation={"n_bits": 8, "symmetric": False, "granularity": "layer",
                    "range": {"name": "minmax"}},
    )


def test_mha_packed_fused_qkv_matches_per_projection():
    """Packed mode fuses q/k/v into one matmul; the result must equal the
    per-projection packed execution (int8 accumulation is exact, so only
    f32 epilogue rounding may differ)."""
    import quantize_tpu.nn.attention as attn_mod

    for w_bits in (8, 4):
        rng = np.random.default_rng(w_bits)
        x = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
        m = QuantMultiheadAttention(32, 4, quant=_mha_cfg_bits(w_bits))
        v = calibrated(m, x)
        deploy = pack_model(m, v, x)
        y_fused = m.apply(deploy, x, mode="packed")

        orig = attn_mod._fused_qkv_packed
        attn_mod._fused_qkv_packed = lambda *a, **k: None
        try:
            y_sep = m.apply(deploy, x, mode="packed")
        finally:
            attn_mod._fused_qkv_packed = orig
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_sep),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # LN-kernel path covered by test_layernorm.py + tiny-ViT packed tests
def test_vit_packed_lane_aligned_ln_fusion_matches_sim():
    """hidden_dim % 128 == 0 routes packed LayerNorms through the Pallas
    LN(+int8-quantize) kernels; the model output must still match the
    simulated quant forward."""
    model = VisionTransformer(
        image_size=32, patch_size=8, num_layers=2, num_heads=2,
        hidden_dim=128, mlp_dim=256, num_classes=5, ctx=QuantCtx(W8A8),
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = calibrated(model, x)
    y_sim = model.apply(v, x, mode="quant")
    deploy = pack_model(model, v, x)
    y_packed = model.apply(deploy, x, mode="packed")
    # packed uses the tanh-approx GELU (sim keeps exact erf), so allow a
    # slightly wider band than pure-quantization equivalence tests
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_sim),
                               rtol=2e-2, atol=4e-2)

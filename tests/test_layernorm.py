"""Pallas fused LayerNorm kernels vs jnp oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.ops.pallas.layernorm import layernorm, layernorm_quant_int8
from quantize_tpu.ops.pallas.qmatmul import quantize_act_int8


def _oracle(x, g, b, eps):
    x = x.astype(np.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


@pytest.mark.parametrize("rows,d", [(300, 768), (8, 256), (5, 100)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layernorm_matches_oracle(rng, rows, d, dtype):
    x = rng.normal(size=(rows, d)).astype(np.float32) * 3 + 0.5
    g = rng.uniform(0.5, 1.5, size=(d,)).astype(np.float32)
    b = rng.normal(size=(d,)).astype(np.float32)
    y = layernorm(jnp.asarray(x, dtype), jnp.asarray(g), jnp.asarray(b), 1e-6)
    assert y.dtype == dtype
    ref = _oracle(x, g, b, 1e-6)
    tol = 5e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(y, np.float32), ref,
                               rtol=tol, atol=tol)


def test_layernorm_lead_dims(rng):
    x = rng.normal(size=(2, 7, 256)).astype(np.float32)
    g = np.ones(256, np.float32)
    b = np.zeros(256, np.float32)
    y = layernorm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    assert y.shape == (2, 7, 256)
    np.testing.assert_allclose(np.asarray(y), _oracle(x, g, b, 1e-6),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("qmin,qmax", [(-128, 127), (0, 255)])
@pytest.mark.parametrize("d", [768, 100])
def test_layernorm_quant_matches_separate_ops(rng, qmin, qmax, d):
    """Fused LN+quantize == layernorm() then quantize_act_int8()."""
    x = rng.normal(size=(37, d)).astype(np.float32) * 2
    g = rng.uniform(0.5, 1.5, size=(d,)).astype(np.float32)
    b = rng.normal(size=(d,)).astype(np.float32) * 0.1
    a_scale, a_zero = np.float32(0.05), np.float32(-3.2)

    q, z_eff = layernorm_quant_int8(jnp.asarray(x), jnp.asarray(g),
                                    jnp.asarray(b), 1e-6,
                                    a_scale, a_zero, qmin, qmax)
    y = layernorm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 1e-6)
    q_ref, z_ref = quantize_act_int8(y, a_scale, a_zero, qmin, qmax)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(float(z_eff), float(z_ref))
    # round() at exact .5 boundaries can differ by 1 ulp between the fused
    # and two-step paths; require exact match elsewhere
    diff = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert (diff <= 1).all() and (diff > 0).mean() < 0.01


def test_fused_layernorm_module_matches_flax(rng):
    """FusedLayerNorm (all modes) == nn.LayerNorm reference numerics."""
    import flax.linen as nn

    from quantize_tpu.nn.norm import FusedLayerNorm

    x = jnp.asarray(rng.normal(size=(4, 9, 256)).astype(np.float32))
    mod = FusedLayerNorm(256, epsilon=1e-6)
    v = mod.init(jax.random.PRNGKey(0), x)
    v = {"params": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, 256), jnp.float32),
                    "bias": jnp.asarray(rng.normal(size=256), jnp.float32) * 0.1}}
    ref_mod = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False)
    y_ref = ref_mod.apply(v, x)
    for mode in ("fp32", "quant", "packed"):
        y = mod.apply(v, x, mode)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

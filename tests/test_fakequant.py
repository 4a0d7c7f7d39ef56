"""Quantization core semantics vs closed-form and torch-oracle checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.quant import (
    QuantSpec, compute_scale_zero, dequantize_core, fake_quant, qrange,
    quantize_core, quantize_int, ste_round,
)


def test_qrange():
    assert qrange(8, True, True) == (-128, 127)
    assert qrange(8, True, False) == (0, 255)
    assert qrange(8, False, True) == (0, 255)
    assert qrange(4, True, True) == (-8, 7)
    assert qrange(2, True, True) == (-2, 1)


def test_scale_symmetric_signed():
    # scale = absmax / (2^(b-1)-1)  (reference minmax.py:127)
    s, z = compute_scale_zero(jnp.asarray(0.0), jnp.asarray(1.27), 8, True, True)
    assert np.isclose(s, 0.01)
    assert z == 0.0


def test_scale_asymmetric_zero_convention():
    # zero = xmin/scale; dequant (q+zero)*scale recovers [xmin, xmax]
    xmin, xmax = jnp.asarray(-0.5), jnp.asarray(1.0)
    s, z = compute_scale_zero(xmin, xmax, 8, False, True)
    assert np.isclose(s, 1.5 / 255)
    assert np.isclose(z, float(xmin / s))
    q = quantize_core(jnp.asarray([-0.5, 1.0]), s, z, 0, 255)
    deq = dequantize_core(q, s, z)
    np.testing.assert_allclose(deq, [-0.5, 1.0], atol=1e-6)


def test_fake_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    absmax = float(jnp.max(jnp.abs(x)))
    s, z = compute_scale_zero(jnp.asarray(-absmax), jnp.asarray(absmax), 8, True, True)
    xq = fake_quant(x, s, z, -128, 127)
    # max error is half a quantization step
    assert float(jnp.max(jnp.abs(x - xq))) <= float(s) / 2 + 1e-6


def test_per_channel_broadcast():
    x = jnp.stack([jnp.linspace(-1, 1, 16), jnp.linspace(-4, 4, 16)], axis=-1)  # (16, 2)
    absmax = jnp.max(jnp.abs(x), axis=0)
    s, z = compute_scale_zero(-absmax, absmax, 8, True, True)
    xq = fake_quant(x, s, z, -128, 127, channel_axis=-1)
    err = jnp.max(jnp.abs(x - xq), axis=0)
    assert float(err[0]) <= float(s[0]) / 2 + 1e-6
    assert float(err[1]) <= float(s[1]) / 2 + 1e-6


def test_ste_round_gradient_is_identity():
    g = jax.grad(lambda v: jnp.sum(ste_round(v) ** 2))(jnp.asarray([0.3, 1.7]))
    # d/dv of v^2 through STE: 2*round(v) * 1
    np.testing.assert_allclose(g, [0.0, 4.0], atol=1e-6)


def test_ste_gradients_match_reference_formulas():
    """Reference Round.backward: dx=g/scale, dscale=-g·x/scale², dzero=-g
    (modelzoo/modules/quantizer.py:28-40). Our autodiff through
    v = x/scale - zero with STE rounding must reproduce them."""
    x = jnp.asarray([0.37, -1.21, 2.9])
    scale = jnp.asarray(0.13)
    zero = jnp.asarray(0.4)

    def f(x, scale, zero):
        return jnp.sum(ste_round(x / scale - zero))

    gx, gs, gz = jax.grad(f, argnums=(0, 1, 2))(x, scale, zero)
    np.testing.assert_allclose(gx, 1.0 / scale * jnp.ones_like(x), rtol=1e-6)
    np.testing.assert_allclose(gs, jnp.sum(-x / scale**2), rtol=1e-6)
    np.testing.assert_allclose(gz, -3.0, rtol=1e-6)


def test_quantize_int_dtype():
    spec = QuantSpec(n_bits=8, symmetric=True, signed=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 8)).astype(np.float32))
    q = quantize_int(x, jnp.asarray(0.1), jnp.asarray(0.0), spec)
    assert q.dtype == jnp.int8
    spec4 = QuantSpec(n_bits=4, symmetric=True, signed=True)
    q4 = quantize_int(x, jnp.asarray(0.5), jnp.asarray(0.0), spec4)
    assert q4.dtype == jnp.int8
    assert int(q4.max()) <= 7 and int(q4.min()) >= -8


def test_matches_torch_fake_quant_oracle():
    """Cross-check symmetric per-tensor path against torch's own
    fake_quantize (independent implementation of the same math)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    x = rng.normal(size=(128,)).astype(np.float32)
    absmax = np.abs(x).max()
    scale = absmax / 127.0

    ours = fake_quant(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(0.0), -128, 127)
    theirs = torch.fake_quantize_per_tensor_affine(
        torch.tensor(x), scale=float(scale), zero_point=0, quant_min=-128, quant_max=127
    ).numpy()
    # identical up to round-half tie behavior (ours: banker's; torch: round-half-to-even too)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_clamp_boundary_scale_gradient_matches_torch():
    """The clamp boundary case every minmax-calibrated channel hits: the
    extreme element sits EXACTLY at qmax. torch clamp passes gradient 1.0
    there, so the reference's scale gradient at that element is
    (q+z) - x/scale = 0; jnp.clip's 0.5 tie-gradient would instead leave a
    spurious qmax/2 term (the round-5 QAT trajectory tier caught this as
    10-100x inflated scale grads). Pins ste_clamp against the torch
    autograd composition element by element."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(11)
    x_np = rng.normal(size=(16,)).astype(np.float32)
    scale_np = np.float32(np.abs(x_np).max() / 127.0)  # extreme at exactly 127

    def ours_fn(scale):
        return jnp.sum(fake_quant(jnp.asarray(x_np), scale,
                                  jnp.asarray(0.0), -128, 127) * 1.0)

    g_ours = jax.grad(ours_fn)(jnp.asarray(scale_np))

    xs = torch.tensor(x_np)
    scale_t = torch.tensor(scale_np, requires_grad=True)
    v = xs / scale_t
    q = (v.round() - v).detach() + v          # reference Round STE
    out = (q.clamp(-128, 127)) * scale_t      # reference simulate
    out.sum().backward()
    np.testing.assert_allclose(np.asarray(g_ours), scale_t.grad.numpy(),
                               rtol=1e-5, atol=1e-5)

    # and the boundary element's own gradient contribution is ~0, not 63.5
    def per_elem(scale):
        return fake_quant(jnp.asarray(x_np), scale, jnp.asarray(0.0),
                          -128, 127)

    jac = jax.jacrev(per_elem)(jnp.asarray(scale_np))
    ext = int(np.argmax(np.abs(x_np)))
    assert abs(float(jac[ext])) < 1e-3, float(jac[ext])


def test_bf16_sim_dtype_close_and_restores():
    """set_quant_sim_dtype('bfloat16'): the narrow fake-quant chain stays
    within one grid step of the f32 result (bf16's ~0.4% quotient error can
    flip rounding near midpoints), integer grids <= 8 bit stay exact where
    no flip occurs, and None restores exact f32."""
    from quantize_tpu.quant.fakequant import set_quant_sim_dtype

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    scale = jnp.asarray(np.abs(rng.normal(size=(32,))).astype(np.float32) * 0.01 + 0.001)
    zero = jnp.zeros((32,))
    f32_out = np.asarray(fake_quant(x, scale, zero, -128, 127))
    try:
        set_quant_sim_dtype("bfloat16")
        b16_out = np.asarray(fake_quant(x, scale, zero, -128, 127))
    finally:
        set_quant_sim_dtype(None)
    # each element within one grid step (midpoint flip) plus the bf16
    # output-rounding envelope (~0.4% of magnitude from the dequant mul)
    step = np.asarray(scale)[None, :]
    bound = 1.02 * step + 0.005 * np.abs(f32_out) + 1e-6
    assert (np.abs(b16_out - f32_out) <= bound).all()
    # most elements unflipped. The flip probability scales with |x/scale|:
    # bf16's ~0.4% relative quotient error is ~0.4 grid units at |v|~100,
    # so 8-bit-magnitude grids see ~10% midpoint flips — the structural
    # accuracy cost the QAT bf16-sim A/B prices (docs/BENCH_NOTES.md r5)
    frac_same = (np.abs(b16_out - f32_out) <= 0.02 * step + 0.005 * np.abs(f32_out)).mean()
    assert frac_same > 0.8, frac_same
    # restored: exact f32 again
    np.testing.assert_array_equal(
        np.asarray(fake_quant(x, scale, zero, -128, 127)), f32_out)

"""Fused quantized matmul kernels vs the jnp oracle, across both the
Pallas (interpret mode on CPU) and XLA-native backends."""
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.ops.pallas.qmatmul import (
    matmul_backend, pack_int4_splithalf, quant_matmul_w4a8, quant_matmul_w8a8,
    quant_matmul_w8a8_xla, quant_matmul_wo, set_matmul_backend,
    unpack_int4_splithalf,
)
from quantize_tpu.ops.ref import quant_matmul_int_ref, quant_matmul_ref, quant_matmul_wo_ref


@pytest.fixture(params=["xla", "pallas"])
def backend(request):
    prev = matmul_backend()
    set_matmul_backend(request.param)
    yield request.param
    set_matmul_backend(prev)


def make_case(m=32, k=64, n=48, w_bits=8, sym_w=True, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(m, k)).astype(np.float32)
    a_scale = np.float32(np.abs(x).max() / 255.0)
    a_zero = np.float32(x.min() / a_scale)
    lo, hi = -(1 << (w_bits - 1)), (1 << (w_bits - 1)) - 1
    w_int = rng.integers(lo, hi + 1, size=(k, n)).astype(np.int8)
    w_scale = rng.uniform(0.005, 0.02, size=(n,)).astype(np.float32)
    w_zero = np.zeros((n,), np.float32) if sym_w else rng.uniform(-3, 3, size=(n,)).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(a_scale), jnp.asarray(a_zero),
            jnp.asarray(w_int), jnp.asarray(w_scale), jnp.asarray(w_zero),
            jnp.asarray(bias))


def test_int_accumulation_equals_dequant_oracle():
    x, a_s, a_z, w, w_s, w_z, b = make_case(sym_w=False)
    ref = quant_matmul_ref(x, a_s, a_z, 0, 255, w, w_s, w_z, b)
    got = quant_matmul_int_ref(x, a_s, a_z, 0, 255, w, w_s, w_z, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_w8a8_xla_matches_oracle():
    x, a_s, a_z, w, w_s, w_z, b = make_case(sym_w=False, seed=1)
    ref = quant_matmul_ref(x, a_s, a_z, 0, 255, w, w_s, w_z, b)
    got = quant_matmul_w8a8_xla(x, a_s, a_z, 0, 255, w, w_s, w_z, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(32, 64, 48), (8, 16, 8), (100, 130, 70)])
def test_w8a8_pallas_matches_oracle(shape, backend):
    m, k, n = shape
    x, a_s, a_z, w, w_s, w_z, b = make_case(m, k, n, sym_w=False, seed=2)
    ref = quant_matmul_ref(x, a_s, a_z, 0, 255, w, w_s, w_z, b)
    got = quant_matmul_w8a8(x, a_s, a_z, 0, 255, w, w_s, w_z, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_w8a8_batched_leading_dims(backend):
    x, a_s, a_z, w, w_s, w_z, b = make_case(32, 64, 48, seed=3)
    x3 = x.reshape(4, 8, 64)
    ref = quant_matmul_ref(x, a_s, a_z, 0, 255, w, w_s, w_z, b)
    got = quant_matmul_w8a8(x3, a_s, a_z, 0, 255, w, w_s, w_z, b)
    assert got.shape == (4, 8, 48)
    np.testing.assert_allclose(np.asarray(got).reshape(32, 48), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int4_splithalf_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(64, 32)).astype(np.int8)
    p = pack_int4_splithalf(jnp.asarray(q))
    assert p.shape == (32, 32)
    np.testing.assert_array_equal(np.asarray(unpack_int4_splithalf(p)), q)


@pytest.mark.parametrize("shape", [(16, 64, 32), (32, 128, 48)])
def test_w4a8_pallas_matches_oracle(shape, backend):
    m, k, n = shape
    x, a_s, a_z, _, w_s, w_z, b = make_case(m, k, n, sym_w=True, seed=4)
    rng = np.random.default_rng(5)
    w4 = rng.integers(-8, 8, size=(k, n)).astype(np.int8)
    ref = quant_matmul_ref(x, a_s, a_z, 0, 255, jnp.asarray(w4), w_s, w_z, b)
    packed = pack_int4_splithalf(jnp.asarray(w4))
    got = quant_matmul_w4a8(x, a_s, a_z, 0, 255, packed, w_s, w_z, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_weight_only_matches_oracle(backend):
    x, _, _, w, w_s, w_z, b = make_case(24, 56, 40, sym_w=False, seed=6)
    ref = quant_matmul_wo_ref(x, w, w_s, w_z, b)
    got = quant_matmul_wo(x, w, w_s, w_z, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

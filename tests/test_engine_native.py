"""Native C++ pack/unpack vs the jnp implementation (same bit layout)."""
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.engine import get_native, tpack, tunpack
from quantize_tpu.quant.pack import tpack as tpack_jnp
from quantize_tpu.quant.pack import tunpack as tunpack_jnp


def test_native_lib_builds():
    assert get_native() is not None, "g++ build of the native engine failed"


@pytest.mark.parametrize("n_bits", [2, 3, 4, 5, 8])
@pytest.mark.parametrize("signed", [True, False])
def test_native_matches_jnp_layout(n_bits, signed):
    rng = np.random.default_rng(n_bits)
    lo, hi = (-(1 << (n_bits - 1)), (1 << (n_bits - 1)) - 1) if signed else (0, (1 << n_bits) - 1)
    x = rng.integers(lo, hi + 1, size=(37,)).astype(np.float32)

    p_native, des_n = tpack(x, n_bits, signed)
    p_jnp, des_j = tpack_jnp(jnp.asarray(x), n_bits, signed)
    np.testing.assert_array_equal(np.asarray(p_native), np.asarray(p_jnp))

    # cross round-trips
    np.testing.assert_array_equal(tunpack(np.asarray(p_jnp), des_j), x)
    np.testing.assert_array_equal(np.asarray(tunpack_jnp(jnp.asarray(p_native), des_n)), x)


def test_native_large_roundtrip_speed():
    rng = np.random.default_rng(0)
    x = rng.integers(-8, 8, size=(1 << 20,)).astype(np.float32)
    p, des = tpack(x, 4, True)
    assert p.nbytes == (1 << 20) // 2
    out = tunpack(p, des)
    np.testing.assert_array_equal(out, x)

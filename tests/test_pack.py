"""Bit-packing round trips vs a NumPy oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.quant import (
    PackDescriptor, pack_int4_pairs, tpack, tunpack, unpack_int4_pairs,
)


@pytest.mark.parametrize("n_bits", [2, 3, 4, 5, 6, 7, 8])
@pytest.mark.parametrize("signed", [True, False])
def test_tpack_roundtrip(n_bits, signed):
    rng = np.random.default_rng(n_bits)
    lo, hi = (-(1 << (n_bits - 1)), (1 << (n_bits - 1)) - 1) if signed else (0, (1 << n_bits) - 1)
    x = rng.integers(lo, hi + 1, size=(13, 7)).astype(np.float32)
    packed, des = tpack(jnp.asarray(x), n_bits, signed)
    assert packed.dtype == jnp.uint8
    # density: exactly ceil(n*b/8) bytes — zero wasted bits
    assert packed.shape[0] == -(-x.size * n_bits // 8)
    out = tunpack(packed, des)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_tpack_range_clamped():
    packed, des = tpack(jnp.asarray([300.0, -300.0]), 8, True)
    out = np.asarray(tunpack(packed, des))
    np.testing.assert_array_equal(out, [127.0, -128.0])


def test_descriptor_json_roundtrip():
    des = PackDescriptor(4, True, (3, 5))
    assert PackDescriptor.from_json(des.to_json()) == des


def test_int4_pair_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(16, 8)).astype(np.int8)
    p = pack_int4_pairs(jnp.asarray(q), axis=0)
    assert p.shape == (8, 8) and p.dtype == jnp.int8
    out = unpack_int4_pairs(p, axis=0)
    np.testing.assert_array_equal(np.asarray(out), q)


def test_int4_pair_axis_last():
    rng = np.random.default_rng(1)
    q = rng.integers(-8, 8, size=(4, 6)).astype(np.int8)
    p = pack_int4_pairs(jnp.asarray(q), axis=-1)
    assert p.shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(unpack_int4_pairs(p, axis=-1)), q)


def test_int4_pack_odd_axis_raises():
    with pytest.raises(ValueError):
        pack_int4_pairs(jnp.zeros((3, 4), jnp.int8), axis=0)

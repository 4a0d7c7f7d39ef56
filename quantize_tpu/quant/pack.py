"""Dense sub-byte integer packing for checkpoint storage and deploy kernels.

Replaces the reference's CUDA ``tpack``/``tunpack`` (``engine/kernels/tpack/
tpack.cu:203-255``) with two TPU-appropriate representations:

1. **Dense stream packing** (:func:`tpack` / :func:`tunpack`) — arbitrary
   2..8-bit integers packed with zero wasted bits into a flat ``uint8``
   buffer. The reference's bit-straddling layout is replaced by an
   equivalent-density bit-plane contract that vectorizes on the VPU: each
   element contributes its ``b`` bits LSB-first to a bit stream in element
   order; the stream is chunked into bytes LSB-first. Signed values are
   offset by ``+2^(b-1)`` before packing (reference ``tpack.cu:109-111``).
   A :class:`PackDescriptor` carries ``(n_bits, signed, shape)`` — the
   ``des`` tensor contract of the reference (``tpack.cu:228-238``).

2. **Lane packing for the MXU** (:func:`pack_int4_pairs` /
   :func:`unpack_int4_pairs`) — two int4 nibbles per int8 along the
   contraction axis, the layout the Pallas fused kernels consume. int8
   needs no packing (native MXU operand).

Density is identical to the reference (``ceil(n·b/8)`` bytes); only the bit
order differs, which is private to this framework's checkpoints.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PackDescriptor:
    """Metadata needed to invert :func:`tpack`."""

    n_bits: int
    signed: bool
    shape: Tuple[int, ...]

    def to_json(self) -> str:
        return json.dumps({"n_bits": self.n_bits, "signed": self.signed, "shape": list(self.shape)})

    @classmethod
    def from_json(cls, s: str) -> "PackDescriptor":
        d = json.loads(s)
        return cls(int(d["n_bits"]), bool(d["signed"]), tuple(d["shape"]))


_BYTE_WEIGHTS = np.asarray([1, 2, 4, 8, 16, 32, 64, 128], np.uint8)


def tpack(x: jnp.ndarray, n_bits: int, signed: bool) -> Tuple[jnp.ndarray, PackDescriptor]:
    """Pack an integer-valued array into a dense uint8 bit stream.

    Args:
        x: integer-valued array (any int/float dtype holding integers) with
           values in ``[-2^(b-1), 2^(b-1)-1]`` (signed) or ``[0, 2^b-1]``.
    Returns:
        (packed uint8 1-D array of ``ceil(n·b/8)`` bytes, descriptor)
    """
    if not (1 <= n_bits <= 8):
        raise ValueError(f"tpack supports 1..8 bits, got {n_bits}")
    des = PackDescriptor(n_bits, signed, tuple(x.shape))

    v = jnp.asarray(x)
    lo, hi = (-(1 << (n_bits - 1)), (1 << (n_bits - 1)) - 1) if signed else (0, (1 << n_bits) - 1)
    v = jnp.clip(jnp.round(v.astype(jnp.float32)), lo, hi).astype(jnp.int32)
    if signed:
        v = v + (1 << (n_bits - 1))
    u = v.astype(jnp.uint8).reshape(-1)

    # (N, b) bit planes, LSB first
    shifts = jnp.arange(n_bits, dtype=jnp.uint8)
    bits = (u[:, None] >> shifts[None, :]) & jnp.uint8(1)
    stream = bits.reshape(-1)
    pad = (-stream.shape[0]) % 8
    if pad:
        stream = jnp.concatenate([stream, jnp.zeros((pad,), jnp.uint8)])
    packed = (stream.reshape(-1, 8) * jnp.asarray(_BYTE_WEIGHTS)).sum(
        axis=-1, dtype=jnp.uint32
    ).astype(jnp.uint8)
    return packed, des


def tunpack(packed: jnp.ndarray, des: PackDescriptor, dtype=jnp.float32) -> jnp.ndarray:
    """Invert :func:`tpack`, restoring the original shape and signedness."""
    n_bits = des.n_bits
    n_elems = int(np.prod(des.shape)) if des.shape else 1
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, None] >> shifts[None, :]) & jnp.uint8(1)
    stream = bits.reshape(-1)[: n_elems * n_bits]
    planes = stream.reshape(n_elems, n_bits).astype(jnp.int32)
    weights = (1 << jnp.arange(n_bits, dtype=jnp.int32))
    u = (planes * weights[None, :]).sum(axis=-1)
    if des.signed:
        u = u - (1 << (n_bits - 1))
    return u.reshape(des.shape).astype(dtype)


# ---------------------------------------------------------------------------
# MXU lane packing: int4 pairs in int8 along the contraction axis
# ---------------------------------------------------------------------------

def pack_int4_pairs(q: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Pack signed int4 values pairwise into int8 along ``axis``.

    Element ``2i`` occupies the low nibble, ``2i+1`` the high nibble. The axis
    length must be even (layers pad the contraction dim to MXU tiles anyway).
    """
    q = jnp.asarray(q, jnp.int8)
    axis = axis % q.ndim
    if q.shape[axis] % 2:
        raise ValueError(f"axis {axis} length {q.shape[axis]} must be even for int4 packing")
    even = jnp.take(q, jnp.arange(0, q.shape[axis], 2), axis=axis)
    odd = jnp.take(q, jnp.arange(1, q.shape[axis], 2), axis=axis)
    return ((even & jnp.int8(0x0F)) | (odd.astype(jnp.uint8) << 4).astype(jnp.int8)).astype(jnp.int8)


def unpack_int4_pairs(p: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Unpack int8 nibble pairs back to signed int4 values (as int8)."""
    p = jnp.asarray(p, jnp.int8)
    axis = axis % p.ndim
    # sign-extend low nibble: shift left then arithmetic shift right
    even = (p.astype(jnp.int8) << 4) >> 4
    odd = p >> 4  # arithmetic shift keeps the sign of the high nibble
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(p.shape)
    new_shape[axis] *= 2
    return stacked.reshape(new_shape)
